"""Fuzzy record linkage: blocked Jaro-Winkler candidate matching.

The scale shape is classic entity resolution: never all-pairs —
candidates are generated inside small BLOCKS (equi-join on a blocking
key such as nation/zip/phonetic code), then scored by a vectorized
string-similarity kernel.  The block equi-join is an ordinary shuffle
join Catalyst can plan (broadcast if one side is small); only the
scoring runs in Python, Arrow-batched.

Jaro-Winkler follows the standard definition (match window
max(|a|,|b|)/2 - 1, transpositions halved, Winkler prefix bonus up to
4 chars * 0.1 applied when jaro > 0.7) — the same convention DuckDB's
``jaro_winkler_similarity`` implements, which is what the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    # empty-vs-anything is 0 even for two empties (DuckDB convention)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_taken = [False] * lb
    a_matched = []
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and b[j] == ca:
                b_taken[j] = True
                a_matched.append(ca)
                break
    m = len(a_matched)
    if m == 0:
        return 0.0
    # transpositions: the two matched-character sequences compared
    # position-wise; half the mismatch count, FLOOR division (the
    # DuckDB/commons-text convention — an odd mismatch count arises
    # from cyclic permutations like '018' vs '180')
    b_matched = [b[j] for j in range(lb) if b_taken[j]]
    t = sum(ca != cb for ca, cb in zip(a_matched, b_matched)) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1, boost_threshold: float = 0.7) -> float:
    j = jaro(a, b)
    if j <= boost_threshold:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1.0 - j)


def _jw_udf():
    # created lazily: @pandas_udf needs an active SparkSession
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def jw(a, b):
        import pandas as pd

        return pd.Series(
            [
                jaro_winkler(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ]
        )

    return jw


def blocked_jw_match(
    probes: DataFrame,
    master: DataFrame,
    block_col: str,
    probe_name: str = "name",
    master_name: str = "name",
    threshold: float = 0.9,
) -> DataFrame:
    """Join probes to master on the blocking key, score every in-block
    pair with Jaro-Winkler, keep pairs at/above threshold.

    Returns probe columns + master columns + ``jw`` (rounded 4 dp).
    Candidates per probe are bounded by the block size, not the master
    size — the 100 TB contract.
    """
    cand = probes.join(master, on=block_col, how="inner")
    scored = cand.withColumn(
        "jw", F.round(_jw_udf()(F.col(probe_name), F.col(master_name)), 4)
    )
    return scored.where(F.col("jw") >= threshold)
