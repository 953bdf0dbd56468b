"""HLL-based pre-join cardinality estimation (PLAN_r5 §3).

Estimate the output size of an equi-join WITHOUT executing it — the
planning primitive behind join-order / strategy choices (System R's
|L|·|R| / max(ndv_L, ndv_R) under the containment assumption, with
the ndv terms supplied by HyperLogLog++ sketches instead of catalog
stats).

100 TB shape: ONE aggregation pass per side.  The per-group left pass
shuffles fixed-size HLL partials (mergeable, map-side combined); the
right side reduces to a single stats row that is broadcast onto the
left groups (BroadcastNestedLoopJoin of 1 row — no shuffle of either
fact table, and crucially no execution of the join being estimated).
Estimating from sketches costs O(|L| + |R|) scan with no join at all,
vs the join's own shuffle of both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str | Column,
    right_key: str | Column,
    group_cols: list[str] | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group estimated cardinality of ``left ⋈ right`` on
    ``left_key = right_key``.

    Returns one row per left-side group (or a single global row when
    ``group_cols`` is None) with columns:

      n_left        rows in the group
      ndv_left      approx distinct join keys in the group (HLL, rsd)
      n_right       rows on the right side (global)
      ndv_right     approx distinct join keys on the right (HLL, rsd)
      est_join_rows estimated join output rows for the group:
                    n_left * n_right / max(ndv_left, ndv_right)

    The formula is exact when key multiplicities are uniform and each
    side's key set contains the other's (the classic containment
    assumption); HLL's ~rsd relative error on the ndv terms carries
    through linearly.
    """
    lk = F.col(left_key) if isinstance(left_key, str) else left_key
    rk = F.col(right_key) if isinstance(right_key, str) else right_key

    l_aggs = [
        F.count(F.lit(1)).alias("n_left"),
        F.approx_count_distinct(lk, rsd).alias("ndv_left"),
    ]
    if group_cols:
        l_stats = left.groupBy(*group_cols).agg(*l_aggs)
    else:
        l_stats = left.agg(*l_aggs)
    r_stats = right.agg(
        F.count(F.lit(1)).alias("n_right"),
        F.approx_count_distinct(rk, rsd).alias("ndv_right"),
    )
    # 1-row right stats: broadcast nested-loop of a single row, never a
    # shuffle — the estimate is computed without touching the join
    return l_stats.crossJoin(F.broadcast(r_stats)).withColumn(
        "est_join_rows",
        (
            F.col("n_left").cast("double")
            * F.col("n_right")
            / F.greatest(F.col("ndv_left"), F.col("ndv_right"), F.lit(1))
        ).cast("bigint"),
    )
