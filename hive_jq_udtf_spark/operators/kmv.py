"""KMV (k-minimum-values) distinct sketches with SET OPERATIONS.

HLL answers |A| and |A ∪ B| but cannot intersect; the KMV/theta
family can (Beyer et al. 2007, "On synopses for distinct-value
estimation under multiset operations").  A set's sketch is its k
smallest normalized hash values; then

  D(A)      ≈ (k − 1) / u_k          (u_k = k-th smallest hash)
  sketch(A ∪ B) = k smallest of sketch(A) ∪ sketch(B)
  J(A, B)   ≈ |sketch(A∪B) ∩ sketch(A) ∩ sketch(B)| / k
  D(A ∩ B)  ≈ J · D(A ∪ B)

100 TB shape: per set, ONE exchange — dropDuplicates on (set, hash)
is a shuffle whose map side pre-aggregates, and the k-smallest filter
uses row_number ≤ k so Spark's WindowGroupLimit forwards at most k
rows per set per map task; the driver only ever sees s × k hashes
(s sets × k ≈ kilobytes).  The estimation arithmetic is driver-side
on those bounded sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 → uniform double in (0, 1]; the +2^63/2^64 shift maps the
# signed long range onto the unit interval
_HASH_SCALE = float(2**64)


def kmv_sketches(
    df: DataFrame, set_col: str, value_col: str, k: int = 256
) -> dict[str, list[float]]:
    """One bounded collect: for every distinct value of ``set_col``,
    the k smallest normalized hashes of ``value_col``."""
    h = (
        (F.xxhash64(F.col(value_col)).cast("double") + F.lit(float(2**63) + 1.0))
        / F.lit(_HASH_SCALE)
    ).alias("u")
    distinct = df.select(F.col(set_col).alias("s"), h).dropDuplicates(["s", "u"])
    w = Window.partitionBy("s").orderBy("u")
    topk = distinct.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    out: dict[str, list[float]] = {}
    for r in topk.select("s", "u").collect():
        out.setdefault(r["s"], []).append(r["u"])
    return {s: sorted(v) for s, v in out.items()}


def kmv_distinct(sketch: list[float], k: int) -> float:
    """Distinct-count estimate; exact when the set had < k members
    (the sketch IS the set)."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / sketch[k - 1]


def kmv_intersection(a: list[float], b: list[float], k: int) -> float:
    """Estimated |A ∩ B| from two same-k sketches."""
    union = sorted(set(a) | set(b))[:k]
    if len(union) < k:
        # both sets fully sketched: exact arithmetic
        return float(len(set(a) & set(b)))
    sa, sb = set(a), set(b)
    j = sum(1 for u in union if u in sa and u in sb) / k
    d_union = (k - 1) / union[k - 1]
    return j * d_union
