"""Round-5 continuation wave F: Structured Streaming depth — chained
time-window aggregations (two stateful operators in one pipeline,
Spark 3.4+ multi-stateful support) and native session windows in a
real stream, both in APPEND mode where only watermark-finalized
windows reach the sink.

The determinism trick shared by both: the staged source carries the
events corpus plus one far-future SENTINEL row (+10 days).  The
watermark only advances BETWEEN micro-batches, so after the data
batch it stands ~10 days past the corpus and every real
window/session is finalized and emitted during the trailing NO-DATA
micro-batch (noDataMicroBatches, on by default), while the sentinel's
own window never finalizes and is excluded by construction.  The
oracle therefore equals the batch aggregation over the original
events — the append-mode emission rule made exact instead of racy.

Round-7 measured refinement: the corpus and the sentinel ride ONE
data micro-batch (no maxFilesPerTrigger=1 split) — the watermark
math is identical (it updates after the batch from the batch MAX
event time) and the trailing no-data batch still flushes, but one
whole micro-batch of state-store/WAL cost disappears (chained:
2.3 → 1.4 s warm, output row-for-row identical).

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import stream_events
from .queries import ORACLES, QUERIES, _STREAM_QUERY_SEQ, _stream_shuffle
from .queries_r3 import _staged_dir


def _sentinel_source(sf_dir: str) -> str:
    """events.parquet + a single-row sentinel 10 days past max(ts),
    one file per micro-batch."""
    import os
    import shutil

    def _build(d: str) -> None:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        src = os.path.join(sf_dir, "events.parquet")
        shutil.copy(src, os.path.join(d, "a.parquet"))
        t = pq.read_table(src)
        row = t.slice(0, 1)
        unit = row.column("ts").type.unit
        # sentinel ts = corpus MAX + 10 days (shifting an arbitrary
        # row's own ts would land inside the corpus and double-count)
        ten_days = pa.scalar(
            10 * 86400 * (10**6 if unit == "us" else 10**9), pa.duration(unit)
        )
        far = pc.add(pc.max(t.column("ts")), ten_days)
        cols = {name: row.column(name) for name in row.schema.names}
        cols["ts"] = pa.chunked_array([pa.array([far.as_py()], type=row.column("ts").type)])
        cols["event_id"] = pc.add(cols["event_id"], pa.scalar(10_000_000_000))
        pq.write_table(
            pa.table(cols, schema=row.schema), os.path.join(d, "b.parquet")
        )

    return _staged_dir("sentinel_src", sf_dir, _build)


# ---------------------------------------------------------------------------
# stream_chained_windows — hourly → daily, two stateful operators
# ---------------------------------------------------------------------------


def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained windowed aggregations in ONE streaming pipeline:
    watermarked hourly counts per event_type re-aggregated into daily
    totals via window_time() — two stateful operators, append mode.
    This is the streaming form of a rollup materialization chain
    (hourly MV feeding a daily MV) without an intermediate sink; the
    hourly state bounds memory and the daily aggregate only ever sees
    |hours| rows per type.  Sentinel-flushed (module docstring), so
    the result equals the batch daily aggregation exactly."""
    d = _sentinel_source(sf_dir)
    raw = stream_events(spark, d, glob=None)
    hourly = (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.window_time("w"), "1 day").alias("d"), "event_type"
        )
        .agg(F.sum("c").alias("n"))
    )
    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_chained_{_STREAM_QUERY_SEQ[0]}"
    # n=2: two chained stateful operators keep 2 state stores per
    # shuffle partition, so n=2 runs the same 4 store instances the
    # single-op queries run at the default n=4 (the ss-join rule,
    # plans/queries.py::q_stream_stream_join)
    with _stream_shuffle(spark, 2):
        q = (
            daily.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish within 300s")
    return (
        spark.table(name)
        .select(
            F.unix_timestamp(F.col("d.start")).alias("day_epoch"),
            "event_type",
            "n",
        )
        .orderBy("day_epoch", "event_type")
    )


_ORACLE_STREAM_CHAINED = """
SELECT CAST(epoch(time_bucket(INTERVAL 1 DAY, ts)) AS BIGINT) AS day_epoch,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# stream_session_windows — native session windows on a stream
# ---------------------------------------------------------------------------


def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user on a real stream,
    append mode: a session is emitted only once the watermark proves
    no further event can extend it — the bounded-state sessionization
    contract (state per OPEN session, evicted at finalization).
    Sentinel-flushed, so the emitted set equals batch sessionization;
    the summary aggregates the per-session rows to one row per user
    (top 200 by id) to keep the driver-compared frame small."""
    d = _sentinel_source(sf_dir)
    raw = stream_events(spark, d, glob=None)
    sess = (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_sessions_{_STREAM_QUERY_SEQ[0]}"
    with _stream_shuffle(spark):
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish within 300s")
    # the sentinel row's own singleton session belongs to the injected
    # user at +10 days — drop it by ts-range: its session starts 10
    # days after the corpus max.  The filter must key on the CORPUS
    # max, not the sink max: the sentinel session itself is normally
    # absent (the watermark stops 1h short of it, so append mode
    # never finalizes it) and dropping the sink's max-start row would
    # drop the last LEGITIMATE session instead (caught by the 3-SF
    # strictcheck sweep).  load_table memoizes the reader.
    from ..sources.tables import load_table

    corpus_end = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_timestamp(F.col("ts"))))
        .collect()[0][0]
    )
    return (
        spark.table(name)
        .where(F.unix_timestamp(F.col("session_window.start")) <= corpus_end)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
        .limit(200)
    )


_ORACLE_STREAM_SESSIONS = """
WITH m AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events),
s AS (SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
per AS (SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per GROUP BY 1 ORDER BY 1 LIMIT 200
"""


QUERIES["stream_chained_windows"] = q_stream_chained_windows
ORACLES["stream_chained_windows"] = _ORACLE_STREAM_CHAINED
QUERIES["stream_session_windows"] = q_stream_session_windows
ORACLES["stream_session_windows"] = _ORACLE_STREAM_SESSIONS
