"""Density-based clustering (DBSCAN) over an embedding column.

Decomposition into relational primitives (no Python in the plan):

  1. eps-neighbor graph: pairwise squared euclidean distance under
     whole-stage codegen (zip_with/aggregate HOFs), kept only where
     d² ≤ eps².  Exact all-pairs here; at 100 TB the candidate
     generator swaps to the IVF cell index (similarity.py) exactly
     like semantic_dedup confines its quadratic step — DBSCAN's
     neighbor query IS a fixed-radius similarity join.
  2. core points: neighbor degree ≥ min_pts (degree EXCLUDES the
     point itself; documented convention, mirrored by the oracle).
  3. clusters: connected components over the core–core subgraph via
     the large-star/small-star operator (dedup.py) — O(log²|V|)
     rounds on ANY graph shape (a filament of cores has diameter
     O(n), where one-hop label propagation would silently stop at
     max_iter and split the cluster) and it RAISES on
     non-convergence instead of returning wrong labels.  Component
     id = min reachable vec_id, deterministic.
  4. border points: non-core with ≥ 1 core neighbor join the MINIMUM
     core neighbor's cluster (canonical DBSCAN leaves this
     tie-broken arbitrarily; the min rule pins it for oracles).
  5. everything else is noise (cluster −1).

Reference scope note: the reference engine (CyberAgent/hive-jq-udtf)
has no clustering surface; this belongs to the driver-mandated
LLM-pipeline operator suite alongside kmeans/semantic_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components_lsss
from .similarity import dist2_col


def dbscan_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1.15,
    min_pts: int = 3,
) -> DataFrame:
    """→ (vec_id, cluster, is_core): cluster is the min vec_id of the
    member core component, −1 for noise."""
    pts = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = pts.alias("a"), pts.alias("b")
    half = (
        a.crossJoin(b)
        .where(F.col("a.id") < F.col("b.id"))
        .where(dist2_col(F.col("a.v"), F.col("b.v")) <= F.lit(eps * eps))
        .select(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
    )
    return _finish_dbscan(pts, half, id_col, min_pts)


def dbscan_embeddings_ivf(
    emb: DataFrame,
    centroids,  # sequence of dim-length float sequences (small C)
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1.15,
    min_pts: int = 3,
    n_assign: int = 2,
) -> DataFrame:
    """DBSCAN with the IVF cell index as the eps-neighbor CANDIDATE
    generator — the 100 TB path the exact variant's docstring names:
    each point is assigned to its ``n_assign`` nearest coarse cells
    (pure codegen, ``ivf_cells_codegen``), candidate pairs are pairs
    sharing >= 1 cell (ONE shuffle on cell id, O(sum cell²) work
    confined to cells — never all-pairs), and the exact eps filter
    runs only on candidates.  Semantics: DBSCAN over the
    IVF-candidate graph — deterministic (fixed centroids, fixed tie
    rules), so it oracle-checks exactly; neighbors whose cells don't
    overlap are the documented approximation, measured against the
    exact variant by the recall gate (knn_recall_ivf / the exact
    dbscan_clusters run on the same sample)."""
    from .similarity import ivf_cells_codegen

    pts = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cells = ivf_cells_codegen(pts, centroids, n_assign, vec_col="v", id_col="id").select(
        "id", "cell"
    )
    cand = (
        cells.alias("ca")
        .join(cells.alias("cb"), "cell")
        .where(F.col("ca.id") < F.col("cb.id"))
        .select(F.col("ca.id").alias("x"), F.col("cb.id").alias("y"))
        .distinct()
    )
    half = (
        cand.join(pts.select(F.col("id").alias("x"), F.col("v").alias("vx")), "x")
        .join(pts.select(F.col("id").alias("y"), F.col("v").alias("vy")), "y")
        .where(dist2_col(F.col("vx"), F.col("vy")) <= F.lit(eps * eps))
        .select("x", "y")
    )
    return _finish_dbscan(pts, half, id_col, min_pts)


def _finish_dbscan(
    pts: DataFrame, half: DataFrame, id_col: str, min_pts: int
) -> DataFrame:
    """Steps 2-5 (degree, cores, components, borders, noise) shared
    by the exact and IVF-candidate variants: both produce the same
    half-edge relation shape (x < y, within eps)."""
    edges = half.unionByName(
        half.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("x").agg(F.count(F.lit(1)).alias("nbrs"))
    core = deg.where(F.col("nbrs") >= min_pts).select(F.col("x").alias("id"))
    cc_edges = (
        edges.join(core.withColumnRenamed("id", "x"), "x")
        .join(core.withColumnRenamed("id", "y"), "y")
        .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
    )
    comp = connected_components_lsss(cc_edges).select(
        F.col("doc_id").alias("id"), F.col("component").alias("cluster")
    )
    # isolated core points (min_pts satisfied by non-core neighbors
    # only) have no core-core edge: they form singleton clusters
    comp = comp.unionByName(
        core.join(comp, "id", "left_anti").select("id", F.col("id").alias("cluster"))
    )
    border = (
        edges.join(core.withColumnRenamed("id", "x"), "x", "left_anti")
        .join(comp.withColumnRenamed("id", "y"), "y")
        .groupBy(F.col("x").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = comp.select("id", "cluster", F.lit(True).alias("is_core")).unionByName(
        border.select("id", "cluster", F.lit(False).alias("is_core"))
    )
    return (
        pts.select("id")
        .join(assigned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster", F.lit(-1)).alias("cluster"),
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
        )
    )
