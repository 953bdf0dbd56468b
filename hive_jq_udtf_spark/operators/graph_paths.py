"""Multi-source BFS hop distances over an edge DataFrame —
fixed-round, deterministic.

Reference scope: the reference engine (CyberAgent/hive-jq-udtf) has
no graph operators; this extends the beyond-reference pipeline
coverage as the fourth iterative-graph family (PageRank, LSSS
components, LPA communities, now shortest hops).

The recurrence is Bellman-Ford restricted to hop weights:

    d_r(v) = min over u in N_in(v) ∪ {v} of  d_{r-1}(u) + w(u, v)

with w = 1 on real edges and w = 0 on injected SELF-edges.  The
self-edges make the "keep my current distance" term ride the SAME
join as the relaxation — no per-round union to destroy the cached
layout proof (the LPA/pagerank lesson).  After ``max_hops`` rounds
every node whose true hop distance is <= max_hops carries EXACTLY
that distance (first appearance round = true distance; min keeps
it); all other nodes are absent.  Input self-loops are dropped (a
hop to yourself is never on a shortest path).

Plan regimes, chosen by |V| like communities.py: below the broadcast
gate the distance frame rides a broadcast against edges persisted in
hash(dst) — ZERO per-round shuffles (persist keeps the layout under
AQE where localCheckpoint loses it); above it the edges persist in
hash(src) and each round pays the honest |frontier| + |E| exchange.

Deterministic by construction (integer distances, min), so an
unrolled SQL oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BROADCAST_MAX_NODES = 5_000_000


def multi_source_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    checkpoint_every: int = 2,
    broadcast_dist: bool | None = None,
    plan_probe: list | None = None,
) -> DataFrame:
    """edges: one row per DIRECTED edge (emit both directions for an
    undirected graph; self-loops ignored).  sources: one row per
    source node (column ``node``).  Returns (node, hops) for every
    node within ``max_hops`` of ANY source (sources themselves at 0).

    Source nodes that do not appear in the edge set still return
    (node, 0) — an isolated source is at distance 0 from itself.

    plan_probe: test hook — when a list is passed, each round's
    PRE-checkpoint distance frame is appended so plan-shape tests can
    inspect the per-round join/min physical plan (the returned frame
    is checkpoint-backed, its lineage deliberately truncated)."""
    spark = edges.sparkSession
    # layout width follows the ACTIVE shuffle width (the r10 pagerank
    # fix): per-round task launches track the caller's graph-sized
    # scope instead of defaultParallelism
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    eraw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    nodes = (
        eraw.select(F.col("src").alias("n"))
        .union(eraw.select(F.col("dst").alias("n")))
        .union(sources.select(F.col(node).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if broadcast_dist is None:
        broadcast_dist = nodes.count() <= _BROADCAST_MAX_NODES
    key = "dst" if broadcast_dist else "src"
    e = (
        eraw.select("src", "dst", F.lit(1).alias("w"))
        .unionByName(
            nodes.select(
                F.col("n").alias("src"), F.col("n").alias("dst"),
                F.lit(0).alias("w"),
            )
        )
        .repartition(par, F.col(key))
        .dropDuplicates()
        .persist()
    )
    e.count()  # materialize the layout once

    try:
        dist = sources.select(F.col(node).alias("node"), F.lit(0).alias("d"))
        dist = dist.dropDuplicates().localCheckpoint(eager=True)
        for i in range(max_hops):
            d_in = F.broadcast(dist) if broadcast_dist else dist
            dist = (
                e.join(d_in, e["src"] == d_in["node"])
                .select("dst", (F.col("d") + F.col("w")).alias("nd"))
                .groupBy("dst")
                .agg(F.min("nd").alias("d"))
                .select(F.col("dst").alias("node"), "d")
            )
            if plan_probe is not None:
                plan_probe.append(dist)
            if (i + 1) % checkpoint_every == 0 or i == max_hops - 1:
                dist = dist.localCheckpoint(eager=True)
        return dist.select("node", F.col("d").alias("hops"))
    finally:
        e.unpersist()
