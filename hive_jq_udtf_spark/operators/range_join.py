"""Bucketed range (interval) join: match point events to the
intervals containing them without an inequality join.

Spark plans a bare ``p.ts BETWEEN i.start AND i.end`` predicate as a
broadcast-nested-loop (or a full cross) — quadratic and
memory-unbounded at scale.  The bucketed formulation:

    point  → one row  per (key, time_bucket)
    interval → one row per (key, covered bucket)   [explode sequence]
    equi-join on (key, bucket) → exact interval predicate re-check

turns it into a hash join whose shuffle key is (key, bucket); the
candidate multiplier is interval_span / bucket_width, chosen so
buckets ≈ median interval length.  The exact predicate uses the
full-precision timestamps, so bucketing only prunes — never changes
results (oracle: the plain inequality join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join: every (point, interval) pair with equal ``key``
    and ``start <= point.ts < end``.  Output = all columns of both
    inputs (names must not collide apart from ``key``)."""
    pb = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
    )
    ib = (
        intervals.withColumn(
            "__bs", F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds).cast("long")
        )
        .withColumn(
            "__be", F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds).cast("long")
        )
        .withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    return (
        pb.join(ib, on=[key, "__b"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__b")
    )
