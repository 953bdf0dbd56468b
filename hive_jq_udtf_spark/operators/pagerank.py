"""PageRank over an edge DataFrame — fixed-iteration, deterministic.

Spark-first iterative dataflow: each iteration is ONE join (ranks to
edges on src) + ONE aggregation (sum contributions by dst).  The
edge set is laid out ONCE in a partitioning-preserving cache
(``persist`` — under AQE a ``localCheckpoint``'s LogicalRDD loses
its outputPartitioning and every iteration re-exchanges |E| rows;
verified on the final AdaptiveSparkPlan).  Below a 5M-node gate the
rank frame rides a broadcast and the layout is hash(dst), making
every iteration exchange-free; above it the layout is hash(src) and
each step pays the honest |V| + |E| shuffle.  Ranks are
localCheckpoint()-ed every few iterations to truncate the growing
lineage (the classic iterative-Spark pitfall: an un-truncated
10-join plan recompiles and reoptimizes the whole history each
step).

Fixed iteration count (no convergence collect) keeps the whole run
lazy-plannable and makes the result exactly reproducible by an
unrolled SQL oracle.

The node universe is src ∪ dst, and every iteration re-anchors ranks
on that universe (left join), so sink-only nodes and nodes without
inbound edges keep their base rank and keep CONTRIBUTING in later
iterations.  Mass from dangling (sink-only) nodes is dropped, not
redistributed — the documented delta vs. textbook PageRank; callers
that emit both edge directions (undirected graphs) have no dangling
nodes and are unaffected.  An empty edge set returns an empty result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_BROADCAST_MAX_NODES = 5_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
    shuffle_partitions: int | None = None,
    broadcast_ranks: bool | None = None,
) -> DataFrame:
    """edges: one row per directed edge. Returns (node, rank).

    shuffle_partitions: scope a shuffle width sized to the GRAPH
    around the iteration (the connected_components_lsss convention,
    dedup.py): per-iteration scheduling cost is per-partition, and a
    rank frame of |V| rows pays the full relational default width
    every step.  Measured at sf0.1 (21k nodes, 10 iters): width 64 →
    ~8-13 s, width 8 → ~5.3 s.  Size to |V| / cluster at real scale.
    The conf is restored before returning."""
    import contextlib

    spark = edges.sparkSession

    @contextlib.contextmanager
    def _scoped():
        if shuffle_partitions is None:
            yield
            return
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    with _scoped():
        return _pagerank_run(
            edges, iterations, damping, src, dst, checkpoint_every,
            broadcast_ranks,
        )


def _pagerank_run(
    edges: DataFrame,
    iterations: int,
    damping: float,
    src: str,
    dst: str,
    checkpoint_every: int,
    broadcast_ranks: bool | None,
) -> DataFrame:
    spark = edges.sparkSession
    # layout width = the ACTIVE shuffle width (the caller-scoped
    # graph-sized value when shuffle_partitions is passed): every
    # iteration launches one task per layout partition, so a 32-wide
    # layout under an 8-wide scope pays 10 x 24 no-op task launches
    # (r10; measured ~0.2-0.3 s at sf0.1).  Unscoped callers get the
    # session default — size to |E| / cluster at real scale.
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar to the driver; O(1) result
    if n == 0:
        return nodes.select("node", F.lit(1.0).alias("rank"))  # empty
    if broadcast_ranks is None:
        # ~80 MB of (long, double) with overhead — above it, the rank
        # frame must shuffle, not broadcast
        broadcast_ranks = n <= _BROADCAST_MAX_NODES
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-join degree once; contribution edges carry 1/outdeg.  The
    # w=0.0 SELF-edges replace the former per-iteration anchor union:
    # every node emits rank*0.0 = +0.0 to itself through the SAME
    # join, so nodes without inbound edges stay in the frame at base
    # rank — and no union is left to destroy the cached layout proof
    # (x + 0.0 == x for every finite IEEE double; ranks are finite
    # and non-negative by construction)
    contrib_edges = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("w"),
            )
        )
    )
    # LAY OUT ONCE in an InMemoryRelation: persist() PRESERVES the
    # hash partitioning under AQE, where a localCheckpoint's
    # LogicalRDD silently loses it and every iteration re-exchanges
    # the |E|-row edge set (verified on the final AdaptiveSparkPlan —
    # ENSURE_REQUIREMENTS reappears over a checkpointed scan).
    # broadcast regime: layout hash(dst) → join is map-side (ranks
    # broadcast) and the sum-by-dst aggregation reuses the layout —
    # ZERO per-iteration shuffles.  shuffle regime (|V| > gate):
    # layout hash(src) co-locates the join; ranks (|V|) + join output
    # (|E|) exchange once each per iteration — the honest minimum.
    key = "dst" if broadcast_ranks else "src"
    contrib_edges = contrib_edges.repartition(par, F.col(key)).persist()
    contrib_edges.count()  # materialize the layout once

    try:
        # EAGER-checkpoint the initial rank frame so the FIRST
        # checkpoint-window job sees the same child plan as every
        # later one (an RDD scan of (node, rank)) — when the cadence
        # divides the iteration count evenly, all jobs then compile
        # to the IDENTICAL plan shape and whole-stage codegen hits
        # the janino source cache from job 2 on (r15, guide §1.2;
        # the frame is |V| rows — trivial.  A checkpoint-every-1
        # variant was interleave-A/B'd and measured SLOWER warm:
        # extra job launches cost more than the codegen they save)
        ranks = nodes.select(
            "node", F.lit(1.0 / n).alias("rank")
        ).localCheckpoint(eager=True)
        base = (1.0 - damping) / n
        for i in range(iterations):
            r_in = F.broadcast(ranks) if broadcast_ranks else ranks
            sums = (
                contrib_edges.join(
                    r_in, contrib_edges["src"] == r_in["node"]
                )
                .select("dst", (F.col("rank") * F.col("w")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            ranks = sums.select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.lit(damping) * F.col("s")).alias("rank"),
            )
            if (i + 1) % checkpoint_every == 0:
                # EAGER: executes the last few iterations' work NOW,
                # inside the scoped shuffle width (a lazy checkpoint
                # would defer it to the caller's collect, after the
                # conf is restored); the frame is |V| rows — trivial
                ranks = ranks.localCheckpoint(eager=True)
        if iterations % checkpoint_every != 0:
            # trailing iterations after the last in-loop checkpoint
            # would otherwise execute lazily at the CALLER's action —
            # outside the scoped conf (ADVICE r4) and after the cache
            # below is released; materialize them here
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        # the returned frame is RDD-backed (checkpointed) and never
        # re-reads the cache
        contrib_edges.unpersist()
