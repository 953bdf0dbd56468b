"""t-digest quantile sketch (Dunning & Ertl 2019) — the MERGEABLE
percentile shape for 100 TB.

Spark's built-ins already cover two points on the accuracy/cost
curve: exact ``percentile`` (full per-group sort — cannot scale) and
``approx_percentile`` (Greenwald-Khanna).  The t-digest adds the
third production point: a sketch whose centroids concentrate at the
tails (k1 scale function), so extreme quantiles (p99, p999) keep
near-constant RELATIVE rank accuracy, and whose partials merge
associatively — the property that lets a 1000-executor job build
per-partition digests with mapInPandas (Arrow-vectorized, bounded
~2δ centroids each), shuffle ONLY the centroids (one row per
partition-group, KBs), and merge per group with applyInPandas.  The
raw values never shuffle.

Determinism: the digest content depends on the input partition split
(fixed for a given file layout + config), and the QUERY layer never
exposes raw estimates — it bound-verifies them against exact ranks
(the approx_percentiles pattern, plans/queries.py:1655), so the
oracle is the deterministic all-true table and any accuracy
violation flips a boolean.

Reference parity note: the reference engine (CyberAgent/hive-jq-udtf)
has no sketches; this is §2.6 LLM-pipeline mandate territory, same
family as cms_heavy_hitters (sketch.py) and hll_distinct.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# numpy t-digest kernel (MergingDigest, k1 scale function)
# ---------------------------------------------------------------------------


def _k1(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    """k1 scale function: delta/(2π)·asin(2q−1).  Tail-adaptive —
    cluster capacity ∝ q(1−q), so p99/p999 stay sharp."""
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


def _k1_inv(k: float, delta: float) -> float:
    return (math.sin(k * 2.0 * math.pi / delta) + 1.0) / 2.0


def digest_sorted_units(
    vals: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized digest of RAW values (unit weights): for sorted
    unit-weight input the k1 cluster boundaries are known analytically
    — band j covers quantiles (k1⁻¹(k0+j−1), k1⁻¹(k0+j)] with
    k0 = k1(0) — so the whole build is one sort + one
    np.add.reduceat, no per-value Python loop (the greedy
    merge_centroids pass is O(n) interpreted Python; this is the same
    ≤1-unit-of-k-per-cluster guarantee at numpy speed)."""
    n = vals.size
    if n == 0:
        return vals.astype(np.float64), vals.astype(np.float64)
    vals = np.sort(vals.astype(np.float64))
    k0 = float(_k1(0.0, delta))
    n_bands = int(math.ceil(delta / 2.0)) + 1
    qb = np.array([_k1_inv(k0 + j, delta) for j in range(1, n_bands)])
    ends = np.unique(np.clip(np.ceil(qb * n).astype(np.int64), 1, n))
    if ends.size == 0 or ends[-1] != n:
        ends = np.append(ends, n)
    starts = np.concatenate([[0], ends[:-1]])
    w = (ends - starts).astype(np.float64)
    sums = np.add.reduceat(vals, starts)
    return sums / w, w


def merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One MergingDigest pass: sort by mean, then greedily coalesce
    adjacent centroids while the would-be cluster stays within the k1
    capacity (k(q_right) − k(q_left) ≤ 1).  Works identically for raw
    values (unit weights) and for merging partial digests."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    # current cluster accumulator (weighted mean to avoid overflow)
    cm, cw = float(means[0]), float(weights[0])
    q_left = 0.0  # cumulative weight fraction before current cluster
    k_left = _k1(q_left, delta)
    for i in range(1, means.size):
        w = float(weights[i])
        q_right = q_left + (cw + w) / total
        if _k1(min(q_right, 1.0), delta) - k_left <= 1.0:
            cm += (means[i] - cm) * (w / (cw + w))
            cw += w
        else:
            out_m.append(cm)
            out_w.append(cw)
            q_left += cw / total
            k_left = _k1(min(q_left, 1.0), delta)
            cm, cw = float(means[i]), w
    out_m.append(cm)
    out_w.append(cw)
    return np.asarray(out_m), np.asarray(out_w)


def quantile(
    means: np.ndarray, weights: np.ndarray, qs: list[float]
) -> list[float]:
    """Standard t-digest interpolation: centroid i covers cumulative
    weight (c_{i-1}+w_i/2, c_i − w_i/2]; linear between midpoints,
    clamped to [min, max] at the extremes."""
    total = weights.sum()
    cum = np.cumsum(weights)
    mids = cum - weights / 2.0
    out = []
    for q in qs:
        target = q * total
        if target <= mids[0]:
            out.append(float(means[0]))
            continue
        if target >= mids[-1]:
            out.append(float(means[-1]))
            continue
        i = int(np.searchsorted(mids, target, side="right"))
        lo, hi = mids[i - 1], mids[i]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        out.append(float(means[i - 1] + frac * (means[i] - means[i - 1])))
    return out


# ---------------------------------------------------------------------------
# Spark plumbing: partial build (mapInPandas) → merge (applyInPandas)
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = (
    "group string, means array<double>, weights array<double>, n bigint"
)


def tdigest_partials(
    df: DataFrame, group_col: str, value_col: str, delta: float = 200.0
) -> DataFrame:
    """Per-(partition, group) digests via mapInPandas.  Each output
    row is ≤ ~2δ centroids; the downstream shuffle carries one such
    row per partition-group instead of the raw values."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate the whole partition per group, then digest once
        acc: dict[str, list[np.ndarray]] = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                acc.setdefault(str(g), []).append(
                    sub[value_col].to_numpy(dtype=np.float64)
                )
        rows = []
        for g, chunks in acc.items():
            vals = np.concatenate(chunks)
            m, w = digest_sorted_units(vals, delta)
            rows.append((g, m.tolist(), w.tolist(), int(vals.size)))
        yield pd.DataFrame(
            rows, columns=["group", "means", "weights", "n"]
        )

    return df.select(
        F.col(group_col).cast("string").alias(group_col), value_col
    ).mapInPandas(build, _PARTIAL_SCHEMA)


def tdigest_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    delta: float = 200.0,
) -> DataFrame:
    """group → (n, q, est) rows.  One shuffle (centroids only), merge
    + quantile interpolation per group in applyInPandas."""
    partials = tdigest_partials(df, group_col, value_col, delta)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(x) for x in pdf["means"]])
        weights = np.concatenate([np.asarray(x) for x in pdf["weights"]])
        m, w = merge_centroids(means, weights, delta)
        ests = quantile(m, w, qs)
        n = int(pdf["n"].sum())
        return pd.DataFrame(
            {
                "group": key[0],
                "n": n,
                "q": qs,
                "est": ests,
                "n_centroids": m.size,
            }
        )

    return partials.groupBy("group").applyInPandas(
        merge, "group string, n bigint, q double, est double, n_centroids int"
    )
