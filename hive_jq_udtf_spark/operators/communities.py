"""Synchronous label propagation (LPA) community detection over an
edge DataFrame — fixed-iteration, deterministic.

Reference scope: the reference engine (CyberAgent/hive-jq-udtf) has
no graph operators; this extends the engine's beyond-reference
pipeline coverage alongside pagerank.py / the dedup connected
components.

Spark-first iterative dataflow.  Two plan regimes, chosen by |V|:

* **broadcast regime** (|V| small enough to broadcast the label
  frame, default gate 5M nodes ≈ 80 MB of (long, long)): the edge
  set is laid out hash(dst) ONCE and kept as an ``InMemoryRelation``
  (``persist`` — unlike ``localCheckpoint`` it PRESERVES the output
  partitioning, so Catalyst proves every downstream groupBy
  exchange-free; a checkpointed RDD scan loses that metadata and
  silently re-shuffles each step — measured, not guessed).  Each
  iteration is then: broadcast the |V|-row label frame, map-side
  hash join, two PARTIAL-then-final aggregations that reuse the
  hash(dst) layout — zero shuffles per step.
* **shuffle regime** (huge |V|): same loop with the edges laid out
  hash(src) (join co-location, never re-exchanged thanks to the
  preserved cache partitioning); per step the label frame shuffles
  to hash(src) and the join output shuffles once for the mode
  aggregation — |V| + |E| rows, the honest minimum for synchronous
  LPA at scale.

The node's OWN label (damps the classic synchronous-LPA oscillation
on bipartite graphs and keeps isolated nodes in the frame) rides a
SELF-EDGE injected before the single edge layout, so it flows
through the same join instead of a per-iteration union that would
destroy the partitioning proof.  Input self-loops are dropped first:
a node's own label is counted exactly once per step by construction.

The mode per node breaks ties to the SMALLEST label via a single
``max(struct(cnt, -lab))`` aggregate, not a window.  Deterministic
by construction (fixed iterations, integer counts, total tie
order), so an unrolled SQL oracle replays it exactly.

Label lineage is truncated by eager localCheckpoints every
``checkpoint_every`` iterations (the label frame is |V| rows — the
cheap side; the cached edges are never re-materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# broadcast the label frame below this node count (~80 MB of two
# longs with overhead) — above it, degrade to the shuffle regime
_BROADCAST_MAX_NODES = 5_000_000


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 2,
    shuffle_partitions: int | None = None,
    broadcast_labels: bool | None = None,
    plan_probe: list | None = None,
) -> DataFrame:
    """edges: one row per DIRECTED edge (emit both directions for an
    undirected graph; self-loops are ignored).  Returns
    (node, community) where community is the propagated label (a
    node id) after ``iterations`` sync steps.

    broadcast_labels: None (default) gates on the measured node
    count; True/False force the regime.

    plan_probe: test hook — when a list is passed, each iteration's
    PRE-checkpoint label frame is appended so plan-shape tests can
    inspect the per-step join/aggregation physical plan (the returned
    frame is checkpoint-backed, its lineage deliberately truncated).

    shuffle_partitions: scope a graph-sized shuffle width around the
    iterations (the pagerank convention) — only meaningful in the
    shuffle regime (the broadcast regime has no per-step exchange)."""
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
        return _lpa_run(
            edges, iterations, src, dst, checkpoint_every, broadcast_labels,
            plan_probe,
        )


def _lpa_run(
    edges: DataFrame,
    iterations: int,
    src: str,
    dst: str,
    checkpoint_every: int,
    broadcast_labels: bool | None,
    plan_probe: list | None = None,
) -> DataFrame:
    spark = edges.sparkSession
    # layout width = the ACTIVE shuffle width (caller-scoped,
    # graph-sized) — every iteration launches one task per layout
    # partition, so a defaultParallelism-wide layout under a narrow
    # scope pays (par - scope) no-op task launches per step (the r10
    # pagerank fix, same reasoning)
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    eraw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    nodes = (
        eraw.select(F.col("src").alias("node"))
        .union(eraw.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = nodes.localCheckpoint(eager=True)
    if broadcast_labels is None:
        # nodes is already materialized — this count is metadata-cheap
        broadcast_labels = nodes.count() <= _BROADCAST_MAX_NODES

    # self-edges inject the own-label vote BEFORE the single layout
    # exchange; dedupe rides the same exchange (hash(key) clusters
    # (src, dst) for dropDuplicates)
    key = "dst" if broadcast_labels else "src"
    e = (
        eraw.unionByName(
            nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
        .repartition(par, F.col(key))
        .dropDuplicates()
        .persist()
    )
    e.count()  # materialize the layout once

    try:
        # EAGER-checkpoint the initial label frame: the first
        # checkpoint-window job then starts from the same child shape
        # (an RDD scan of (node, lab)) as every later one, so when
        # the cadence divides the iteration count all jobs compile to
        # ONE plan shape and codegen hits the janino cache from job 2
        # on (r15; a cadence-1 variant measured no faster warm)
        labels = nodes.select(
            "node", F.col("node").alias("lab")
        ).localCheckpoint(eager=True)
        for i in range(iterations):
            lab_in = F.broadcast(labels) if broadcast_labels else labels
            neigh = e.join(lab_in, e["src"] == lab_in["node"]).select(
                F.col("dst").alias("node"), "lab"
            )
            counted = neigh.groupBy("node", "lab").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            labels = (
                counted.groupBy("node")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("lab")).alias("nl"))
                    ).alias("m")
                )
                .select("node", (-F.col("m.nl")).alias("lab"))
            )
            if plan_probe is not None:
                plan_probe.append(labels)
            if (i + 1) % checkpoint_every == 0:
                labels = labels.localCheckpoint(eager=True)
        if iterations % checkpoint_every != 0:
            # run trailing shuffles inside the scoped width; also
            # detaches the result from the cached edges
            labels = labels.localCheckpoint(eager=True)
        return labels.select("node", F.col("lab").alias("community"))
    finally:
        # the returned frame is RDD-backed (checkpointed), never
        # re-reads the cache
        e.unpersist()
