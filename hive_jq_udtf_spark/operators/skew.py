"""Skew-mitigation operators (SURVEY §4 / driver mandate: "skewed
keys hurt ... salting for skew, AQE for runtime re-plan").

Two complementary tools:

- salted_join: explicit key-salting for a skewed LEFT side joining a
  small-ish RIGHT side.  Left rows get a random-ish but
  DETERMINISTIC salt (hash of the whole row modulo n_salts) appended
  to the join key; the right side is replicated n_salts times.  The
  shuffle then spreads each hot key over n_salts reducers.  Results
  are exactly those of the unsalted join (verified by oracle query
  `salted_region_revenue`).
- salted_agg_count: two-phase aggregation for skewed group keys —
  partial aggregate on (key, salt), final aggregate on key.  For
  algebraic aggregates (count/sum/min/max) this is exact.

At 100 TB prefer AQE's skew-join splitting first
(spark.sql.adaptive.skewJoin.enabled, on by default here); explicit
salting remains necessary when a single key exceeds what one task
can hold even after AQE splitting, or for aggregations (AQE does not
split skewed aggregation keys).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right
    side replicated ``n_salts``×.  Exact same rows as
    ``left.join(right, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = (F.xxhash64(*[F.col(c) for c in left.columns]) % n_salts + n_salts) % n_salts
    l_s = left.withColumn("__salt", salt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_s.join(r_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """count(*) per key via two-phase (key, salt) → key aggregation;
    exact, and the first shuffle spreads hot keys across n_salts
    partitions.  (Spark's own partial aggregation already does this
    map-side; the explicit form is for when the merge state itself
    is the bottleneck, e.g. count-distinct sketches per hot key.)"""
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__pc"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pc").alias("n"))
