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
