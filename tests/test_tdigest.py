"""t-digest kernel + Spark plumbing tests (operators/tdigest.py).

Kernel invariants (pure numpy, no Spark): mass conservation, mean
conservation, bounded centroid count, merge-of-partials accuracy.
Plumbing: tdigest_quantiles never shuffles raw values (the exchange
carries digest rows only) and its estimates hit the documented rank
bound on real data.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_jq_udtf_spark.operators.tdigest import (
    merge_centroids,
    quantile,
    tdigest_quantiles,
)

RNG = np.random.default_rng(7)


def _rank(vals: np.ndarray, x: float) -> float:
    return float((vals <= x).sum()) / vals.size


def test_mass_and_mean_conserved():
    vals = RNG.lognormal(0.0, 2.0, size=50_000)
    m, w = merge_centroids(vals, np.ones_like(vals), delta=200.0)
    assert w.sum() == pytest.approx(vals.size)
    assert (m * w).sum() == pytest.approx(vals.sum(), rel=1e-9)
    assert np.all(np.diff(m) >= 0)  # centroids stay sorted


def test_centroid_count_bounded():
    vals = RNG.normal(size=200_000)
    m, _ = merge_centroids(vals, np.ones_like(vals), delta=200.0)
    # k1 scale function ⇒ at most ~2δ centroids regardless of n
    assert m.size <= 2 * 200


def test_quantile_rank_error_single_digest():
    vals = np.sort(RNG.lognormal(0.0, 2.0, size=100_000))
    m, w = merge_centroids(vals, np.ones_like(vals), delta=200.0)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = quantile(m, w, [q])[0]
        assert abs(_rank(vals, est) - q) < 0.01, q


def test_merge_of_partials_matches_bound():
    """The mergeability property: digesting 8 shards separately and
    merging the centroids must stay within the same rank bound as a
    single digest — this is what makes the shape shuffle-free."""
    vals = RNG.lognormal(0.0, 2.0, size=80_000)
    shards = np.array_split(vals, 8)
    ms, ws = [], []
    for s in shards:
        m, w = merge_centroids(s, np.ones_like(s), delta=200.0)
        ms.append(m)
        ws.append(w)
    m, w = merge_centroids(np.concatenate(ms), np.concatenate(ws), delta=200.0)
    assert w.sum() == pytest.approx(vals.size)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = quantile(m, w, [q])[0]
        assert abs(_rank(np.sort(vals), est) - q) < 0.012, q


def test_degenerate_inputs():
    m, w = merge_centroids(np.array([]), np.array([]), delta=100.0)
    assert m.size == 0
    m, w = merge_centroids(np.array([5.0]), np.array([1.0]), delta=100.0)
    assert quantile(m, w, [0.0, 0.5, 1.0]) == [5.0, 5.0, 5.0]
    # constant column: every quantile is the constant
    vals = np.full(1000, 3.25)
    m, w = merge_centroids(vals, np.ones_like(vals), delta=100.0)
    assert quantile(m, w, [0.1, 0.9]) == [3.25, 3.25]


def test_spark_estimates_and_shuffle_shape(spark):
    from hive_jq_udtf_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    est = tdigest_quantiles(li, "l_returnflag", "l_extendedprice", [0.5], 200.0)
    rows = {r["group"]: r for r in est.collect()}
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for g, sub in pdf.groupby("l_returnflag"):
        vals = sub["l_extendedprice"].to_numpy()
        r = rows[str(g)]
        assert r["n"] == vals.size  # mass reached the merge intact
        assert abs(_rank(vals, r["est"]) - 0.5) < 0.01 + 2.0 / vals.size
    # plan shape: the exchange input is the mapInPandas digest rows —
    # raw lineitem values must be digested BEFORE the shuffle
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan
    before_exchange = plan.split("Exchange hashpartitioning", 1)[-1]
    assert "MapInPandas" in before_exchange  # digest below the exchange


def test_vectorized_unit_digest_matches_bound():
    from hive_jq_udtf_spark.operators.tdigest import digest_sorted_units

    vals = RNG.lognormal(0.0, 2.0, size=100_000)
    m, w = digest_sorted_units(vals, 200.0)
    assert w.sum() == pytest.approx(vals.size)
    assert (m * w).sum() == pytest.approx(vals.sum(), rel=1e-9)
    assert m.size <= 2 * 200
    svals = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = quantile(m, w, [q])[0]
        assert abs(_rank(svals, est) - q) < 0.01, q
    # degenerate shapes
    m, w = digest_sorted_units(np.array([]), 100.0)
    assert m.size == 0
    m, w = digest_sorted_units(np.array([2.0]), 100.0)
    assert (m.tolist(), w.tolist()) == ([2.0], [1.0])
