"""As-of (time-travel) join — attribute each left event to the most
recent right event at or before it, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive
formulation is an inequality join (O(n·m) nested loop or a range
cross) that collapses at scale.  This operator uses the union +
window formulation instead:

    tag left/right rows → union → window over (key) ordered by
    (ts, tag) → last non-null right-payload seen so far → keep left rows

which costs exactly ONE shuffle on the key (the window partition),
scales linearly, and inherits AQE skew splitting.  Ties (left.ts ==
right.ts) match the right row (right sorts before left at equal ts),
matching DuckDB's ASOF `>=` semantics.  SQL equality semantics for
NULL keys are preserved: NULL-key right rows are dropped (they can
match nothing) and NULL-key left rows come back with NULL payloads.
Among right rows tied on (key, ts), the one with the LARGEST payload
struct wins (a deterministic total order — include a unique id in
``right_cols`` to make the choice reproducible end-to-end).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_r",
) -> DataFrame:
    """For every left row: columns of the latest right row with
    right.ts <= left.ts and equal key (NULLs when no such row).

    Output = all left columns + [c + suffix for c in right_cols] +
    ts_r (the matched right timestamp)."""
    l_tagged = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    # right payload struct with a stable field list
    r_payload = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    # NULL-key right rows can never match (SQL equality) — drop them
    # instead of letting the NULL window partition pair them up
    r_tagged = right.where(F.col(key).isNotNull()).select(
        F.col(key), F.col(ts), F.lit(0).alias("__tag"), r_payload.alias("__r")
    )
    l_unioned = l_tagged.withColumn(
        "__r", F.lit(None).cast(r_tagged.schema["__r"].dataType)
    )
    unioned = l_unioned.unionByName(
        r_tagged.withColumn("__l", F.lit(None).cast(l_tagged.schema["__l"].dataType))
        .select(key, ts, "__tag", "__l", "__r")
    )
    # __r as the final sort key makes the order total (struct compare:
    # __rts, then right_cols) — without it, right rows tied on
    # (key, ts) would be matched nondeterministically across runs
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = matched.where(F.col("__tag") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__last_r.__rts").alias(ts + suffix),
        *[F.col(f"__last_r.{c}").alias(c + suffix) for c in right_cols],
    )
    return out
