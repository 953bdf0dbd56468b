"""Distributed Lloyd's k-means over an embedding column.

The fully-distributed clustering shape for 100 TB corpora (data
curation, SemDeDup-style pruning, IVF codebooks): unlike
similarity.py::train_centroids (bounded-sample, driver-side numpy),
NO vector ever leaves the executors here —

  assign  broadcast the k×d centroid matrix as literal arrays and
          compute the argmin of k squared-L2 distances in PURE
          codegen (zip_with + aggregate HOFs; no Python, no shuffle);
  update  per-cluster per-dimension means via posexplode →
          groupBy(cluster, dim) — one shuffle of (cluster, dim)
          partial sums, map-side combined, k×d result rows;
  sync    collect ONLY the k×d centroid matrix per iteration
          (k=8, d=64 → 4 KB — bounded, like pagerank's stats).

Determinism contract (what makes an exact SQL oracle possible):
init = the k vectors with the smallest ids; ties in the distance
argmin break to the lowest cluster id; updated centroids are rounded
to ``round_decimals`` so cross-engine float-sum jitter (unordered
partial aggregation) cannot leak into the next iteration's
comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance vec ↔ literal centroid, sequential
    element-order summation (matches DuckDB's list_distance order, so
    near-tie comparisons agree cross-engine)."""
    return F.aggregate(
        F.zip_with(vec, F.lit(centroid), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Nearest-centroid assignment, pure codegen.  Ties break to the
    lowest cluster id (array_position finds the FIRST minimum).

    The centroid matrix rides a broadcast 1-row frame instead of
    being inlined as literals: the generated code is then IDENTICAL
    across Lloyd iterations (only the broadcast DATA changes), so the
    whole-stage-codegen cache hits from iteration 2 on — with
    centroid literals every iteration re-ran Janino on a fresh k×d
    expression (measured −0.3 s warm at sf0.1; the win grows with
    k×d since generated-code size does).  Distance is the same
    sequential element-order sum (zip_with + aggregate) as before,
    per centroid via transform."""
    spark = df.sparkSession
    cents_df = spark.createDataFrame(
        [([ [float(x) for x in c] for c in centroids ],)],
        "__cents array<array<double>>",
    )
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.transform(
        F.col("__cents"),
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return (
        df.crossJoin(F.broadcast(cents_df))
        .withColumn(out_col, cid)
        .drop("__cents")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> tuple[list[list[float]], DataFrame]:
    """Run ``iters`` Lloyd iterations; returns (final centroids, the
    final assignment frame with ``cluster_id``).

    An empty cluster keeps its previous centroid (no re-seeding — the
    deterministic choice the oracle can replicate)."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"kmeans_fit: fewer vectors ({len(init_rows)}) than k={k}")
    centroids = [[float(x) for x in r[1]] for r in init_rows]

    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        means = (
            assigned.select(
                "cluster_id",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("pos", "val"),
            )
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("val"), round_decimals).alias("m"))
            .collect()
        )
        new = {c: list(centroids[c]) for c in range(k)}  # empty → keep
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cluster_id"], {})[r["pos"]] = r["m"]
        for c, d in by_cid.items():
            new[c] = [d[p] for p in sorted(d)]
        centroids = [new[c] for c in range(k)]

    return centroids, assign_clusters(df, centroids, vec_col=vec_col)
