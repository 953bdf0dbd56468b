"""Synchronous label propagation (LPA) community detection over an
edge DataFrame — fixed-iteration, deterministic.

Reference scope: the reference engine (CyberAgent/hive-jq-udtf) has
no graph operators; this extends the engine's beyond-reference
pipeline coverage alongside pagerank.py / the dedup connected
components.

Spark-first iterative dataflow, same discipline as
``operators/pagerank.py``: the edge set is hash-partitioned on src
ONCE and eagerly checkpointed, so each iteration pays a single
node-sized shuffle (the label frame), never re-exchanging the edges.
Each iteration:

1. join labels to edges on src → neighbor label stream (dst, lab),
2. union the node's OWN label (one row per node — damps the classic
   synchronous-LPA oscillation on bipartite graphs and keeps
   isolated nodes in the frame),
3. count (node, lab) occurrences (map-side combinable),
4. pick the mode per node with ties broken by SMALLEST label — via a
   single ``max(struct(cnt, -lab))`` aggregate, not a window, so the
   per-iteration reduction is two aggregations that AQE chains on the
   same key family, with no row_number materialization.

Deterministic by construction (fixed iterations, integer counts,
total tie order), so an unrolled SQL oracle replays it exactly.

At 100 TB: per-iteration cost is one broadcast-or-shuffle join of
|E| edge rows against a |V|-row label frame plus two integer
aggregations — the same shape proven by pagerank; lineage is
truncated by eager localCheckpoints every ``checkpoint_every``
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 2,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """edges: one row per DIRECTED edge (emit both directions for an
    undirected graph).  Returns (node, community) where community is
    the propagated label (a node id) after ``iterations`` sync steps.

    shuffle_partitions: scope a graph-sized shuffle width around the
    iterations (the pagerank convention) — the label frame is |V|
    rows and pays per-partition scheduling every step."""
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
        return _lpa_run(edges, iterations, src, dst, checkpoint_every)


def _lpa_run(
    edges: DataFrame, iterations: int, src: str, dst: str, checkpoint_every: int
) -> DataFrame:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # partition the edges on the join key once; every iteration's join
    # reads the checkpointed layout without re-exchanging |E| rows
    e = e.repartition(F.col("src")).localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)

    labels = nodes.select("node", F.col("node").alias("lab"))
    for i in range(iterations):
        neigh = e.join(labels, e["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "lab"
        )
        stream = neigh.unionByName(labels.select("node", "lab"))
        counted = stream.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            counted.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("lab"))
        )
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
    if iterations % checkpoint_every != 0:
        # run trailing shuffles inside the scoped width (pagerank rule)
        labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("lab").alias("community"))
