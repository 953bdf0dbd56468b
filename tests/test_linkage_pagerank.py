"""Unit gates for the round-3 operators: the Jaro-Winkler kernel must
be bit-equal to DuckDB's jaro_winkler_similarity (it IS the oracle
contract), and PageRank must conserve probability mass."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_jq_udtf_spark.operators.linkage import jaro, jaro_winkler


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("martha", "marhta", 0.9611111111111111),
        ("DIXON", "DICKSONX", 0.8133333333333332),
        ("abc", "xyz", 0.0),
        ("", "x", 0.0),
        ("a", "a", 1.0),
        ("CRATE", "TRACE", 0.7333333333333334),
    ],
)
def test_jw_known_values(a, b, expected):
    assert jaro_winkler(a, b) == pytest.approx(expected, abs=1e-12)


def test_jaro_symmetry_and_bounds():
    cases = [("abcdef", "fedcba"), ("aa", "aaa"), ("ab", "ba"), ("x", "y")]
    for a, b in cases:
        assert abs(jaro(a, b) - jaro(b, a)) < 1e-12
        assert 0.0 <= jaro_winkler(a, b) <= 1.0


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdeXYZ0189#", max_size=24),
    st.text(alphabet="abcdeXYZ0189#", max_size=24),
)
def test_jw_matches_duckdb(a, b):
    got = jaro_winkler(a, b)
    want = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-12)


def test_pagerank_mass_conservation(spark):
    from pyspark.sql import functions as F

    from hive_jq_udtf_spark.operators.pagerank import pagerank

    # undirected triangle + pendant: every node has out-edges
    raw = [(1, 2), (2, 3), (3, 1), (3, 4)]
    edges = spark.createDataFrame(
        raw + [(b, a) for a, b in raw], "src long, dst long"
    )
    pr = pagerank(edges, iterations=20)
    rows = {r["node"]: r["rank"] for r in pr.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    # the degree-3 hub outranks the pendant
    assert rows[3] > rows[4]


def test_pagerank_sink_and_source_nodes(spark):
    """ADVICE r3: sink-only nodes belong to the node universe (rank >
    base, fed by inbound mass), source-only nodes keep contributing
    every iteration instead of dropping out of the frame after the
    first, and an empty edge set returns an empty frame (no
    ZeroDivisionError)."""
    from hive_jq_udtf_spark.operators.pagerank import pagerank

    # 1 -> 2 -> 3: node 3 is sink-only, node 1 source-only
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert set(rows) == {1, 2, 3}
    base = (1 - 0.85) / 3
    assert rows[1] == pytest.approx(base, abs=1e-12)
    # node 2 receives node 1's STEADY contribution: base + d*base, not
    # just the first-iteration echo
    assert rows[2] == pytest.approx(base + 0.85 * base, abs=1e-12)
    assert rows[3] > rows[2] > rows[1]

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty, iterations=3)
    assert out.columns == ["node", "rank"] and out.count() == 0


def test_pq_recall_vs_exact(spark):
    """PQ is approximate; the gate is recall@5 against exact L2 on
    real embeddings — compression must not destroy neighborhoods."""
    import numpy as np
    from pyspark.sql import functions as F

    from hive_jq_udtf_spark.operators.similarity import pq_encode, pq_topk
    from hive_jq_udtf_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.orderBy("vec_id").collect()
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    centroids = V[:16]
    codes = pq_encode(emb, centroids, m=8)
    out = pq_topk(emb.where(F.col("vec_id") < 10), codes, centroids, m=8, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for q in range(10):
        d2 = ((V - V[ids == q][0]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d2, kind="stable")[:5]])
        hits += len(exact & got[q])
        total += 5
    # Untrained first-16 codebooks on random near-orthogonal 64-dim
    # vectors are maximally hard for PQ; observed recall@5 ≈ 0.36.
    # The gate is that quantization carries real signal: ≥ 0.2 versus
    # the 0.01 random-guess baseline (5 of 500).
    assert hits / total >= 0.2, f"recall@5 {hits/total:.2f}"


# ---------------------------------------------------------------------------
# triangle counting (operators/graph.py)
# ---------------------------------------------------------------------------


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles; adding a pendant edge and a duplicate /
    reversed / self-loop edge must change nothing."""
    from hive_jq_udtf_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(3, 9), (1, 0), (2, 2), (0, 1)]  # pendant, rev-dup, loop, dup
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_count(df).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (5, 7, 4)


def test_triangle_count_triangle_free(spark):
    from hive_jq_udtf_spark.operators.graph import triangle_count

    # a path and a star: no triangles
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).first()
    assert row["n_triangles"] == 0 and row["n_edges"] == 6


def test_triangle_count_empty(spark):
    from hive_jq_udtf_spark.operators.graph import triangle_count

    df = spark.createDataFrame([], "src long, dst long")
    row = triangle_count(df).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (0, 0, 0)


def test_triangle_count_hub_skew(spark):
    """Hub wheel: center 0 connected to a 40-cycle — 40 triangles.
    Degree orientation points every spoke AWAY from the hub, so the
    wedge join fans out over the cycle nodes (outdeg ≤ 3), not the
    hub's degree-41."""
    from hive_jq_udtf_spark.operators.graph import triangle_count

    n = 40
    spokes = [(0, i) for i in range(1, n + 1)]
    cycle = [(i, i % n + 1) for i in range(1, n + 1)]
    df = spark.createDataFrame(spokes + cycle, "src long, dst long")
    row = triangle_count(df).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (n + 1, 2 * n, n)


def test_kcore_known_graphs(spark):
    """K4 ∪ pendant: 3-core is exactly K4.  A cycle has a 2-core
    (itself) and an empty 3-core."""
    from hive_jq_udtf_spark.operators.graph import k_core

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(3, 9), (9, 8)]  # pendant chain peels away
    df = spark.createDataFrame(noisy, "src long, dst long")
    r = k_core(df, k=3, steps=4).first()
    assert (r["n_core_nodes"], r["n_core_edges"], r["converged"]) == (4, 6, True)

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    r2 = k_core(df, k=2, steps=2).first()
    assert (r2["n_core_nodes"], r2["n_core_edges"], r2["converged"]) == (6, 6, True)
    r3 = k_core(df, k=3, steps=2).first()
    assert (r3["n_core_nodes"], r3["n_core_edges"], r3["converged"]) == (0, 0, True)


def test_kcore_deep_chain_needs_steps(spark):
    """A long path peels one layer per step from each end — with too
    few steps the fixpoint certificate must come back False, never a
    silently-wrong core."""
    from hive_jq_udtf_spark.operators.graph import k_core

    path = [(i, i + 1) for i in range(12)]
    r = k_core(spark.createDataFrame(path, "src long, dst long"), k=2, steps=2).first()
    assert r["converged"] is False
    r = k_core(spark.createDataFrame(path, "src long, dst long"), k=2, steps=7).first()
    assert r["converged"] is True and r["n_core_edges"] == 0
