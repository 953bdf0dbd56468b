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
