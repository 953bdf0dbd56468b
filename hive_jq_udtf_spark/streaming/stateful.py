"""Custom stateful streaming operators (SURVEY §2.3 streaming row —
extension beyond the stateless reference, driver mandate).

applyInPandasWithState: per-user running aggregates over an event
stream with jq-extracted metrics, with processing-time timeout for
state eviction.  At scale, state is partitioned by the grouping key
(user_id) — Spark shuffles each micro-batch by key and keeps state
in the state store (RocksDB-backed on a real cluster)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..jqlib import jq_compile

STATE_SCHEMA = "n_events long, sum_k double"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_k", T.DoubleType()),
    ]
)


def running_user_totals(
    events_stream: DataFrame,
    json_col: str = "props",
    program: str = ".k",
    timeout_ms: int = 0,
) -> DataFrame:
    """Running per-user (count, sum of jq-extracted metric)."""
    prog_src = program

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # timeout invocation: no new data for this key within the
            # window — evict the state and emit nothing.  Without this,
            # the accumulation path below would re-emit the stale
            # totals, re-arm the timeout, and keep the state forever
            # (unbounded state growth).
            state.remove()
            return
        prog = jq_compile(prog_src)
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            for js in pdf[json_col]:
                for out in prog.iter(None if js is None else __import__("json").loads(js)):
                    if isinstance(out, (int, float)) and not isinstance(out, bool):
                        n += 1
                        s += float(out)
        state.update((n, s))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_k": [s]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )
