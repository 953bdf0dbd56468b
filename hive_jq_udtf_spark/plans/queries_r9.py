"""Round-9 queries.

- ``embedding_whiten`` — whitened PCA projection of the embedding
  corpus (VERDICT r8 #6): center, rotate onto the top-k components,
  normalize per-component variance — the transform SemDeDup-style
  curation runs before cosine thresholds.  The k x d parameters ride
  a broadcast one-row frame; the corpus never leaves the executors.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES
from .queries_r8 import _PCA_TOPK_ITERS, _pca_topk_chain

# whitening uses the top-3 components (k=3 keeps the generated oracle
# chain a third shorter than pca_topk's k=4 while still exercising
# deflation twice)
_WHITEN_K = 3


def q_embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitened projection ``y_c = (x - mu) . v_c / sqrt(lam_c)`` of
    every embedding onto the top-{k} principal components — one row
    per (vec_id, comp), y rounded to 6 dp.

    Scale audit: the component fit is the embedding_pca_topk pipeline
    (ONE distributed n*d^2/2 codegen moment aggregate + O(d^2)
    driver-side deflated power iteration, corpus-size-independent
    collect); the projection itself is one whole-stage-codegen pass
    with the k x d matrix broadcast as a one-row frame
    (operators/pca.py::whiten_projection) — zero shuffles over the
    corpus, so it holds at 100 TB exactly like a filter would.  The
    oracle rebuilds the identical 6-dp loadings / 4-dp eigenvalues by
    unrolling the power steps in SQL (queries_r8._pca_topk_chain) and
    replays the projection from the same rounded inputs."""
    from ..operators.pca import (
        dimension_means_rounded,
        power_iteration_topk,
        whiten_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comps, d = power_iteration_topk(
        emb, k=_WHITEN_K, vec_col="embedding", iters=_PCA_TOPK_ITERS
    )
    mu = dimension_means_rounded(emb)
    out = whiten_projection(emb, comps, mu)
    return out.orderBy("vec_id", "comp")


def _gen_whiten_oracle(k: int = _WHITEN_K, iters: int = _PCA_TOPK_ITERS) -> str:
    header, parts, names = _pca_topk_chain(k, iters)
    loads = "\nUNION ALL ".join(
        f"SELECT {c} AS comp, {prev}.i AS dim,"
        f" round({sgn}.s * {prev}.v, 6) + 0.0 AS l,"
        f" round({lam}.l, 4) + 0.0 AS lam"
        f" FROM {prev} CROSS JOIN {sgn} CROSS JOIN {lam}"
        for c, (prev, lam, sgn) in enumerate(names, start=1)
    )
    chain = ",\n".join(parts)
    return f"""
WITH {header},
{chain},
loadings AS MATERIALIZED ({loads}),
mu AS (SELECT i, round(avg(x), 6) AS mu FROM flat GROUP BY 1)
SELECT f.vec_id, CAST(ld.comp AS INTEGER) AS comp,
       round(sum((f.x - mu.mu) * (ld.l / sqrt(ld.lam))), 6) + 0.0 AS y
FROM flat f
JOIN mu ON mu.i = f.i
JOIN loadings ld ON ld.dim = f.i
GROUP BY 1, 2
ORDER BY vec_id, comp
"""


QUERIES["embedding_whiten"] = q_embedding_whiten
ORACLES["embedding_whiten"] = _gen_whiten_oracle()


# ---------------------------------------------------------------------------
# semantic_dedup_whitened — SemDeDup in whitened space (the operation
# VERDICT r8 #6 named as the whitening's purpose in curation pipelines)
# ---------------------------------------------------------------------------

_WSD_THRESHOLD = 0.999
# direction-grid resolution: each normalized whitened coordinate
# u_c = y_c/||y|| is binned into floor(u_c * Q) (clamped to Q-1), so
# cells partition the DIRECTION sphere at (2Q)^k granularity — the
# tunable that keeps the within-cell quadratic step bounded: raise Q
# with corpus size until a cell's pair block fits an executor
# (cosine >= 0.999 neighbors differ by ~2.6 degrees, far inside one
# Q=4 cell except at boundaries — the same boundary-miss recall
# trade semantic_dedup's centroid cells document)
_WSD_Q = 4


def q_semantic_dedup_whitened(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup in WHITENED space: embeddings are projected onto
    the top-3 whitened components (embedding_whiten's pipeline), each
    vector is bucketed by a DIRECTION-GRID cell (its normalized
    coordinates quantized at resolution Q — the whitened-space
    analogue of SemDeDup's centroid cells, with Q playing the role of
    the centroid count: whitening makes the axes comparable, so a
    uniform grid is a meaningful partition), and within every cell
    the higher-id member of each pair with whitened cosine >= {t} is
    dropped.  Output: one row per occupied cell with member and
    dropped counts — all integers.

    Scale shape: identical to semantic_dedup — the quadratic step is
    confined to a cell, the corpus shuffles once on the cell id,
    cross-cell pairs never materialize, and the cell count scales
    with Q (see _WSD_Q) rather than being fixed, so the per-cell pair
    block stays executor-sized at any corpus.  Determinism: y values
    are 6-dp rounded (whiten_projection's contract), the 3-term dot,
    norms and normalized coordinates are CLOSED-FORM expressions over
    pivoted columns (identical association in both engines — no
    aggregation-order float risk), the grid index is floor() of
    identical doubles, and the cosine is rounded to 6 dp before the
    threshold compare."""
    from pyspark.sql import functions as F

    from ..operators.pca import (
        dimension_means_rounded,
        power_iteration_topk,
        whiten_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comps, d = power_iteration_topk(
        emb, k=_WHITEN_K, vec_col="embedding", iters=_PCA_TOPK_ITERS
    )
    mu = dimension_means_rounded(emb)
    w = whiten_projection(emb, comps, mu)
    q = _WSD_Q

    def bin_of(c: str):
        # floor(u*Q) clamped to Q-1 (u == 1.0 exactly would overflow
        # the top bin), shifted to 0..2Q-1
        u = F.col(c) / F.col("nrm")
        return (
            F.least(F.floor(u * q), F.lit(q - 1)).cast("int") + F.lit(q)
        )

    piv = (
        w.groupBy("vec_id")
        .pivot("comp", [1, 2, 3])
        .agg(F.first("y"))
        .withColumnsRenamed({"1": "y1", "2": "y2", "3": "y3"})
        .withColumn(
            "nrm",
            F.sqrt(
                F.col("y1") * F.col("y1")
                + F.col("y2") * F.col("y2")
                + F.col("y3") * F.col("y3")
            ),
        )
        .where(F.col("nrm") > 0)
        .withColumn(
            "cell",
            bin_of("y1") * (2 * q) * (2 * q)
            + bin_of("y2") * (2 * q)
            + bin_of("y3"),
        )
    )
    a = piv.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("y1").alias("a1"),
        F.col("y2").alias("a2"),
        F.col("y3").alias("a3"),
        F.col("nrm").alias("na"),
    )
    b = piv.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("y1").alias("b1"),
        F.col("y2").alias("b2"),
        F.col("y3").alias("b3"),
        F.col("nrm").alias("nb"),
    )
    cos6 = F.round(
        (
            F.col("a1") * F.col("b1")
            + F.col("a2") * F.col("b2")
            + F.col("a3") * F.col("b3")
        )
        / (F.col("na") * F.col("nb")),
        6,
    )
    losers = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos6 >= F.lit(_WSD_THRESHOLD))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        piv.join(losers.withColumn("dropped", F.lit(1)), "vec_id", "left")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("dropped"), F.lit(0))).alias("n_dropped"),
        )
        .orderBy("cell")
    )


def _gen_wsd_oracle(k: int = _WHITEN_K, iters: int = _PCA_TOPK_ITERS) -> str:
    header, parts, names = _pca_topk_chain(k, iters)
    loads = "\nUNION ALL ".join(
        f"SELECT {c} AS comp, {prev}.i AS dim,"
        f" round({sgn}.s * {prev}.v, 6) + 0.0 AS l,"
        f" round({lam}.l, 4) + 0.0 AS lam"
        f" FROM {prev} CROSS JOIN {sgn} CROSS JOIN {lam}"
        for c, (prev, lam, sgn) in enumerate(names, start=1)
    )
    chain = ",\n".join(parts)
    return f"""
WITH {header},
{chain},
loadings AS MATERIALIZED ({loads}),
mu AS (SELECT i, round(avg(x), 6) AS mu FROM flat GROUP BY 1),
proj AS MATERIALIZED (
  SELECT f.vec_id, ld.comp,
         round(sum((f.x - mu.mu) * (ld.l / sqrt(ld.lam))), 6) + 0.0 AS y
  FROM flat f JOIN mu ON mu.i = f.i JOIN loadings ld ON ld.dim = f.i
  GROUP BY 1, 2),
piv AS MATERIALIZED (
  SELECT vec_id,
         max(CASE WHEN comp = 1 THEN y END) AS y1,
         max(CASE WHEN comp = 2 THEN y END) AS y2,
         max(CASE WHEN comp = 3 THEN y END) AS y3
  FROM proj GROUP BY 1),
normed AS MATERIALIZED (
  SELECT vec_id, y1, y2, y3, sqrt(y1 * y1 + y2 * y2 + y3 * y3) AS nrm
  FROM piv WHERE sqrt(y1 * y1 + y2 * y2 + y3 * y3) > 0),
cells AS MATERIALIZED (
  SELECT vec_id, y1, y2, y3, nrm,
         (CAST(least(floor(y1 / nrm * {_WSD_Q}), {_WSD_Q - 1}) AS INTEGER) + {_WSD_Q})
           * {2 * _WSD_Q} * {2 * _WSD_Q}
         + (CAST(least(floor(y2 / nrm * {_WSD_Q}), {_WSD_Q - 1}) AS INTEGER) + {_WSD_Q})
           * {2 * _WSD_Q}
         + (CAST(least(floor(y3 / nrm * {_WSD_Q}), {_WSD_Q - 1}) AS INTEGER) + {_WSD_Q})
           AS cell
  FROM normed),
losers AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round((a.y1 * b.y1 + a.y2 * b.y2 + a.y3 * b.y3)
              / (a.nrm * b.nrm), 6) >= {_WSD_THRESHOLD})
SELECT c.cell, count(*) AS n_members,
       CAST(sum(CASE WHEN l.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped
FROM cells c LEFT JOIN losers l ON l.vec_id = c.vec_id
GROUP BY 1 ORDER BY 1
"""


QUERIES["semantic_dedup_whitened"] = q_semantic_dedup_whitened
ORACLES["semantic_dedup_whitened"] = _gen_wsd_oracle()
