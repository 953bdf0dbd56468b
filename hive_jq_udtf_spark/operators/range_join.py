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


def interval_overlap_pairs(
    intervals: DataFrame,
    key: str,
    id_col: str,
    start: str,
    end: str,
    bucket_seconds: int = 30 * 86400,
) -> DataFrame:
    """Interval×interval OVERLAP self-join per key: every pair of
    intervals (id_a < id_b) under the same key with
    ``a.start <= b.end AND b.start <= a.end``, each pair emitted
    EXACTLY ONCE.

    Same bucketing idea as interval_join_bucketed, plus the
    report-once trick that makes it shuffle-minimal: an overlapping
    pair co-occupies every bucket their spans share, so a naive
    bucket-join needs a distinct() over the (potentially huge) pair
    stream; instead each pair is counted only in the ONE bucket
    containing the overlap's start (max of the two starts) — a pure
    filter, no dedup exchange.  Shuffle key is (key, bucket);
    bucket_seconds tunes replication (≈ median interval span).
    """
    b = F.lit(bucket_seconds)
    iv = intervals.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_timestamp(F.col(start)).alias("s"),
        F.unix_timestamp(F.col(end)).alias("e"),
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / b).cast("long"),
                F.floor(F.col("e") / b).cast("long"),
            )
        ),
    )
    a = iv.select("k", "__b", F.col("id").alias("id_a"),
                  F.col("s").alias("sa"), F.col("e").alias("ea"))
    c = iv.select("k", "__b", F.col("id").alias("id_b"),
                  F.col("s").alias("sb"), F.col("e").alias("eb"))
    return (
        a.join(c, ["k", "__b"])
        .where(F.col("id_a") < F.col("id_b"))
        .where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        # report-once: only the bucket holding the overlap start emits
        .where(
            F.floor(F.greatest(F.col("sa"), F.col("sb")) / b).cast("long")
            == F.col("__b")
        )
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
        )
    )
