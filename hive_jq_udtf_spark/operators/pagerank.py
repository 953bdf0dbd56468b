"""PageRank over an edge DataFrame — fixed-iteration, deterministic.

Spark-first iterative dataflow: each iteration is ONE join (ranks to
edges on src) + ONE aggregation (sum contributions by dst), both
shuffling on the node id, so a 1000-executor run re-uses the same
hash partitioning every iteration.  Ranks are localCheckpoint()-ed
every few iterations to truncate the growing lineage (the classic
iterative-Spark pitfall: an un-truncated 10-join plan recompiles and
reoptimizes the whole history each step).

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


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
    shuffle_partitions: int | None = None,
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
            edges, iterations, damping, src, dst, checkpoint_every
        )


def _pagerank_run(
    edges: DataFrame,
    iterations: int,
    damping: float,
    src: str,
    dst: str,
    checkpoint_every: int,
) -> DataFrame:
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
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # pre-join degree once; contribution edges carry 1/outdeg
    contrib_edges = e.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )
    # HASH-PARTITION ON src BEFORE the eager checkpoint: LogicalRDD
    # preserves the physical outputPartitioning, so every iteration's
    # join consumes the edge set WITHOUT re-exchanging it — the only
    # per-iteration shuffle left is the (nodes-sized) rank side.
    # Measured at sf0.1 (1.18 M edges, 10 iters): 14-16 s → 6-8 s.
    contrib_edges = contrib_edges.repartition(F.col("src")).localCheckpoint(
        eager=True
    )

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    # zero-contribution anchor rows: unioned into every iteration's
    # aggregation so nodes with no inbound edges stay in the frame
    # (rank = base) and keep contributing — WITHOUT adding a join or a
    # second shuffle per iteration (the zeros ride the same exchange
    # as the contributions; x + 0.0 == x for every IEEE double)
    anchor = nodes.select(F.col("node").alias("dst"), F.lit(0.0).alias("c"))
    for i in range(iterations):
        sums = (
            contrib_edges.join(ranks, contrib_edges["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .unionByName(anchor)
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = sums.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("s")).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            # EAGER: executes the last few iterations' shuffles NOW,
            # inside the scoped shuffle width (a lazy checkpoint would
            # defer them to the caller's collect, after the conf is
            # restored); the materialized frame is |V| rows — trivial
            ranks = ranks.localCheckpoint(eager=True)
    if iterations % checkpoint_every != 0:
        # trailing iterations after the last in-loop checkpoint would
        # otherwise execute lazily at the CALLER's action — outside the
        # scoped shuffle-partitions conf (ADVICE r4); materialize them
        # here so every iteration's shuffle runs inside the scope
        ranks = ranks.localCheckpoint(eager=True)
    return ranks
