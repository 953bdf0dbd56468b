"""Triangle counting — the canonical "joins can do graphs" operator.

Spark-first shape (Suri & Vassilvitskii's MR "node-iterator++" /
degree-ordered orientation, the same strategy GraphFrames uses):

1. normalize to undirected distinct edges;
2. orient each edge from its LOWER-(degree, id) endpoint to the
   higher one — every undirected edge appears exactly once, and the
   max out-degree is O(sqrt(m)), which is the whole trick: the wedge
   join below is bounded by sum(outdeg²) ≤ m·sqrt(m) instead of
   sum(deg²), which a power-law hub would otherwise blow up
   (the skew-killer at 100 TB);
3. wedges: self-join oriented edges on the common source (a→b, a→c,
   b<c in orientation order);
4. close: semi-join wedges against the oriented edge set on (b, c) —
   every hit is exactly one triangle (each triangle is counted once,
   from its minimum-(degree, id) corner).

All four steps are plain DataFrame joins/aggregations — shuffles on
node ids, no driver-side graph state, AQE-skew-splittable.

Reference parity note: the reference engine has no graph operators;
this extends the §2.6 suite alongside pagerank (pagerank.py) and the
connected-components pair (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """edges: one row per edge, either direction, self-loops and
    duplicates tolerated.  Returns a 1-row frame
    (n_nodes, n_edges, n_triangles)."""
    e = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    # orientation key: (degree, id) — total order, so each undirected
    # edge gets exactly one direction
    da = deg.select(F.col("u").alias("_a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("_b"), F.col("d").alias("db"))
    ranked = (
        e.join(da, e["u"] == da["_a"])
        .join(db, e["v"] == db["_b"])
        .select(
            "u",
            "v",
            (
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("u") < F.col("v")))
            ).alias("fwd"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("fwd"), F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(F.col("fwd"), F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    o2 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_c"))
    wedges = o1.join(o2, "w_a").where(F.col("w_b") < F.col("w_c"))
    # (b, c) may be oriented either way relative to the b<c id order
    # used to dedup wedges — probe both via the id-normalized edge set
    closing = e.select(F.col("u").alias("w_b"), F.col("v").alias("w_c"))
    tri = wedges.join(closing, ["w_b", "w_c"], "left_semi")
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(deg.agg(F.count("*").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def k_core(
    edges: DataFrame,
    k: int,
    steps: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes with degree < k (and their edges) until stable.  Returns a
    1-row frame (n_core_nodes, n_core_edges, converged).

    Spark shape: each peel step is one degree aggregation + two
    co-partitioned semi joins, all keyed on node id; the shrinking
    edge set is localCheckpoint-ed per step (bounded lineage).  The
    step count is CAPPED (``steps``) so a SQL oracle can unroll the
    identical peel; the loop exits early once a peel removes nothing
    (monotonicity makes the early exit result-identical to the full
    unroll).  ``converged`` certifies a confirming no-op peel happened
    within the cap — i.e. the true fixpoint needs depth ≤ steps−1 —
    so a data set needing deeper peeling fails loudly (flag False,
    caught by the oracle compare) instead of returning a non-core.
    """
    from pyspark.sql import Observation

    def _peel_checkpoint(df: DataFrame) -> tuple[DataFrame, int]:
        """Materialize a peel step and read its edge count off the
        SAME job via observe() — the lsss convention (dedup.py)."""
        obs = Observation()
        out = df.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        return out, int(obs.get["n"])

    e, n_edges = _peel_checkpoint(
        edges.select(F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    stable = n_edges == 0
    for _ in range(steps):
        if stable:
            break
        deg = (
            e.select(F.col("u").alias("n"))
            .union(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n")
        e, n_after = _peel_checkpoint(
            e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
        )
        # peeling is monotone: an unchanged edge count IS the fixpoint
        # (early exit yields the identical result to the full unroll)
        stable = n_after == n_edges
        n_edges = n_after
    nodes = e.select(F.col("u").alias("n")).union(
        e.select(F.col("v").alias("n"))
    ).distinct()
    return (
        nodes.agg(F.count("*").alias("n_core_nodes"))
        .crossJoin(e.agg(F.count("*").alias("n_core_edges")))
        .select(
            "n_core_nodes",
            "n_core_edges",
            F.lit(bool(stable)).alias("converged"),
        )
    )
