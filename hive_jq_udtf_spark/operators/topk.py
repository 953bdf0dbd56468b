"""Per-key top-k with DYNAMIC k (PLAN_r5 §3).

Spark's WindowGroupLimit rule pushes ``row_number() <= LITERAL`` into
the shuffle (each map task forwards at most k rows per key), but only
for literal bounds — a per-key ``k`` column defeats the rule and the
exchange carries the whole fact table again.

The two-stage shape here keeps the pushdown: rank once and filter by
the static UPPER BOUND of k (literal → WindowGroupLimit fires, the
exchange carries O(partitions × keys × max_k) rows), then apply the
dynamic per-key trim ``rank <= k`` as an ordinary post-filter on the
already-tiny frame.  At 100 TB the first stage is the entire cost;
the dynamic trim is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key_dynamic(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k_col: str | Column,
    max_k: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Keep the top-``k`` rows per key where ``k`` varies per key
    (``k_col``, already joined onto ``df``).  k values above
    ``max_k`` are CLAMPED to it — max_k is the static pushdown bound,
    so ranks beyond it cannot be produced; pick max_k ≥ max(k).
    ``order_cols`` must be a total order (include a tiebreaker) for
    deterministic results."""
    kc = F.col(k_col) if isinstance(k_col, str) else k_col
    # the literal bound is what WindowGroupLimit pushes into the
    # shuffle; a k value above max_k would be SILENTLY truncated by
    # it, so enforce the contract visibly: clamp k to max_k.  NULL k
    # (e.g. an unconfigured key after a left join) must keep yielding
    # ZERO rows — least() skips NULLs, so map NULL to -1 first
    kc = F.least(F.coalesce(kc, F.lit(-1)), F.lit(max_k))
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    ranked = df.withColumn(rank_name, F.row_number().over(w))
    # literal bound FIRST (its own filter → WindowGroupLimit pushes it
    # into the shuffle), dynamic bound second on the surviving rows
    return ranked.where(F.col(rank_name) <= F.lit(max_k)).where(
        F.col(rank_name) <= kc
    )
