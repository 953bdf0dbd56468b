"""Top principal component of an embedding corpus via power iteration.

Architecture (the kmeans.py convention — distribute the O(n) pass,
keep the O(d^2) core driver-side):

* The DISTRIBUTED part is the only part that scales with the corpus:
  per-dimension means and the upper-triangle second-moment matrix
  E[x_i * x_j] — n*d^2/2 products executed in whole-stage codegen
  with map-side partial aggregation, one tiny d^2-row shuffle.
* The covariance matrix is rounded to 6 dp (the proven cross-engine
  equality contract for avg-of-doubles, docs/oracle_determinism.md)
  and collected: O(d^2) rows, INDEPENDENT of corpus size — at 100 TB
  this collect is the same ~2080 rows it is at sf0.001.
* Power iteration runs driver-side on the rounded matrix with plain
  sequential Python float arithmetic (ascending-j sums), so a SQL
  oracle that unrolls the same K steps reproduces the arithmetic to
  ~1e-14 — far inside the 6-dp output round.  numpy is deliberately
  NOT used: its pairwise/SIMD summation orders differ from SQL's.

Sign convention: the eigenvector is flipped so the largest-|loading|
component (smallest dimension index on ties) is positive.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix_rounded(emb: DataFrame, vec_col: str = "embedding"):
    """Population covariance of the vector column, each entry
    round(E[xi*xj] - E[xi]*E[xj], 6), as a driver-side dict
    {(i, j): c} over the full symmetric matrix, plus the dimension."""
    flat = emb.select(
        "vec_id", F.posexplode(F.col(vec_col).cast("array<double>"))
    ).withColumnsRenamed({"pos": "i", "col": "x"})
    flat = flat.localCheckpoint(eager=True)  # feeds means + both join sides
    means = flat.groupBy("i").agg(F.avg("x").alias("mu"))
    a, b = flat.alias("a"), flat.alias("b")
    prods = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.avg(F.col("a.x") * F.col("b.x")).alias("exy"))
    )
    cov_rows = (
        prods.join(F.broadcast(means.withColumnsRenamed({"mu": "mu_i"})), "i")
        .join(
            F.broadcast(
                means.withColumnsRenamed({"i": "j", "mu": "mu_j"})
            ),
            "j",
        )
        .select(
            "i",
            "j",
            F.round(F.col("exy") - F.col("mu_i") * F.col("mu_j"), 6).alias("c"),
        )
        .collect()
    )
    cov: dict[tuple[int, int], float] = {}
    d = 0
    for r in cov_rows:
        cov[(r["i"], r["j"])] = r["c"]
        cov[(r["j"], r["i"])] = r["c"]
        d = max(d, r["j"] + 1)
    return cov, d


def power_iteration_top_eig(
    emb: DataFrame, vec_col: str = "embedding", iters: int = 12
):
    """Returns (loadings, eigval, d): the dominant eigenvector of the
    rounded covariance matrix after ``iters`` power steps from the
    uniform unit vector, sign-pinned, plus the Rayleigh-quotient
    eigenvalue.  Pure sequential float arithmetic — see module doc."""
    cov, d = covariance_matrix_rounded(emb, vec_col)
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            s = 0.0
            for j in range(d):
                s += cov[(i, j)] * v[j]
            w.append(s)
        n = 0.0
        for x in w:
            n += x * x
        n = math.sqrt(n)
        v = [x / n for x in w]
    # Rayleigh quotient on the final normalized vector
    lam = 0.0
    for i in range(d):
        s = 0.0
        for j in range(d):
            s += cov[(i, j)] * v[j]
        lam += v[i] * s
    # sign pin: largest |loading| positive, smallest index on ties
    m = 0
    for i in range(1, d):
        if abs(v[i]) > abs(v[m]):
            m = i
    if v[m] < 0:
        v = [-x for x in v]
    return v, lam, d


def _power_once(cov: dict, d: int, iters: int):
    """One power-iteration run on a driver-side matrix: returns the
    UNPINNED final vector and its Rayleigh eigenvalue.  Sequential
    float arithmetic (see module doc)."""
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            s = 0.0
            for j in range(d):
                s += cov[(i, j)] * v[j]
            w.append(s)
        n = 0.0
        for x in w:
            n += x * x
        n = math.sqrt(n)
        v = [x / n for x in w]
    lam = 0.0
    for i in range(d):
        s = 0.0
        for j in range(d):
            s += cov[(i, j)] * v[j]
        lam += v[i] * s
    return v, lam


def power_iteration_topk(
    emb: DataFrame, k: int = 4, vec_col: str = "embedding", iters: int = 12
):
    """Top-``k`` principal components by DEFLATED power iteration
    (VERDICT r7 #7): the distributed work is still the single n*d^2/2
    moment aggregation of :func:`covariance_matrix_rounded`; every
    component after the first costs only a driver-side d^2 deflation
    ``cov[i][j] -= lam * v[i] * v[j]`` on the collected matrix —
    corpus-size-independent, like the collect itself.

    Deflation uses the UNPINNED vector (v v^T is sign-invariant, and
    an exact-arithmetic SQL replay must subtract the identical
    products); the RETURNED loadings are sign-pinned per component.
    Fixed ``iters`` per component means the result is a deterministic
    function of the rounded matrix — components whose eigenvalues are
    nearly tied are a fixed, replayable mixture rather than a
    converged eigenbasis (the standard power-iteration caveat; at 12
    iterations the top components of a real spectrum separate fine).

    Returns (components, d) where components is a list of k
    (loadings, eigval) pairs in decreasing-eigenvalue order.
    """
    cov, d = covariance_matrix_rounded(emb, vec_col)
    cov = dict(cov)
    comps = []
    for _ in range(k):
        v, lam = _power_once(cov, d, iters)
        # deflate BEFORE pinning; (lam * v[i]) * v[j] ordering is the
        # replay contract with the SQL oracle
        for i in range(d):
            for j in range(d):
                cov[(i, j)] = cov[(i, j)] - lam * v[i] * v[j]
        m = 0
        for i in range(1, d):
            if abs(v[i]) > abs(v[m]):
                m = i
        out = [-x for x in v] if v[m] < 0 else list(v)
        comps.append((out, lam))
    return comps, d


def dimension_means_rounded(emb: DataFrame, vec_col: str = "embedding"):
    """Per-dimension means of the vector column, rounded to 6 dp (the
    cross-engine avg-of-doubles contract), as a driver-side list."""
    rows = (
        emb.select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .withColumnsRenamed({"pos": "i", "col": "x"})
        .groupBy("i")
        .agg(F.round(F.avg("x"), 6).alias("mu"))
        .collect()
    )
    mu = [0.0] * len(rows)
    for r in rows:
        mu[r["i"]] = r["mu"] + 0.0
    return mu


# above this dimensionality the projection switches from the
# interpreted aggregate() HOF to the Arrow Gram-block kernel: the
# repo's own measurement (BASELINE r4) has interpreted HOF lambdas
# ~6x slower than Arrow-batched numpy per element, and the HOF does
# O(k*d) lambda steps per row — fine at d=64, a bottleneck at d>=512
_WHITEN_ARROW_MIN_D = 256


def _whiten_projection_arrow(
    emb: DataFrame, means, w_flat, k: int, d: int, vec_col: str, id_col: str
) -> DataFrame:
    """Arrow mapInPandas path: per batch Y = (X - mu) @ W.T — one BLAS
    matmul per Arrow batch, rows exploded to (id, comp, y).  Rounding
    mimics Spark's HALF_UP (sign * floor(|y|*1e6 + 0.5)).  Delta vs
    the HOF path: BLAS sums are blocked/SIMD-ordered, not the oracle's
    ascending-i sequence, so the last ulps can differ pre-round — this
    kernel is the SCALE path (d >= _WHITEN_ARROW_MIN_D); the
    oracle-replayable HOF stays the contract path at small d."""
    import numpy as np
    import pandas as pd

    W = np.asarray(w_flat, dtype=np.float64).reshape(k, d)
    mu = np.asarray(means, dtype=np.float64)
    comps = np.arange(1, k + 1, dtype=np.int32)

    def run(batches):
        for pdf in batches:
            b = len(pdf)
            if not b:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Y = (X - mu) @ W.T
            Y = np.sign(Y) * np.floor(np.abs(Y) * 1e6 + 0.5) / 1e6 + 0.0
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k),
                    "comp": np.tile(comps, b),
                    "y": Y.reshape(-1),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, comp int, y double"
    )


def whiten_projection(
    emb: DataFrame,
    components,
    means,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool | None = None,
) -> DataFrame:
    """Whitened projection of every embedding row onto ``k``
    principal components: ``y_c = sum_i (x_i - mu_i) * v_c_i /
    sqrt(lam_c)`` — the centering + rotation + per-component variance
    normalization a SemDeDup-style curation pipeline runs before
    cosine thresholds, so distances are comparable across components.

    Scale architecture: ``components`` (k x d sign-pinned loadings +
    eigenvalues from :func:`power_iteration_topk`) and ``means`` are
    O(k*d) driver-side values; they ride a BROADCAST one-row frame —
    never literals, so the codegen plan is identical across parameter
    values (k x d literal matrices force a fresh Janino compile per
    matrix, the kmeans lesson) — and the corpus never leaves the
    executors: one whole-stage-codegen pass, zero shuffles.

    Determinism contract: loadings are rounded to 6 dp and
    eigenvalues to 4 dp BEFORE the scale factor ``v/sqrt(lam)`` is
    formed, and means arrive pre-rounded (6 dp), so a SQL oracle that
    rebuilds the same rounded inputs replays the projection to
    ~1e-13 — inside the 6-dp output round.  The inner sum runs
    ascending-i (aggregate over sequence).

    Kernel dispatch (r10, VERDICT r9 #7): at d >= 256 (or
    ``use_arrow=True``) the projection runs as an Arrow mapInPandas
    BLAS matmul per batch (`_whiten_projection_arrow`) — the measured
    ~6x interpreted-HOF-vs-Arrow gap (BASELINE r4) times O(k*d)
    lambda steps per row makes the HOF the bottleneck at model-scale
    d; the HOF stays the oracle-replayable contract path at small d
    (BLAS summation order differs in the last ulps pre-round).

    Returns (id_col, comp int [1-based], y double [rounded 6 dp]).
    """
    k = len(components)
    d = len(means)
    w_flat = []
    for v, lam in components:
        s = math.sqrt(round(lam, 4))
        for i in range(d):
            w_flat.append((round(v[i], 6) + 0.0) / s)
    if use_arrow is None:
        use_arrow = d >= _WHITEN_ARROW_MIN_D
    if use_arrow:
        # scale path (VERDICT r9 #7): one BLAS matmul per Arrow batch
        # instead of O(k*d) interpreted lambda steps per row; same
        # rounded parameters, same output schema
        return _whiten_projection_arrow(
            emb, means, w_flat, k, d, vec_col, id_col
        )
    spark = emb.sparkSession
    params = spark.createDataFrame(
        [(means, w_flat)], "mu array<double>, w array<double>"
    )
    ys = F.expr(
        f"transform(sequence(0, {k - 1}), c -> aggregate("
        f" sequence(0, {d - 1}), CAST(0 AS DOUBLE),"
        f" (acc, i) -> acc + (CAST(element_at(__x, i + 1) AS DOUBLE)"
        f" - element_at(mu, i + 1)) * element_at(w, c * {d} + i + 1)))"
    )
    return (
        emb.select(id_col, F.col(vec_col).alias("__x"))
        .crossJoin(F.broadcast(params))
        .select(id_col, F.posexplode(ys).alias("c0", "y"))
        .select(
            id_col,
            (F.col("c0") + 1).alias("comp"),
            (F.round("y", 6) + 0.0).alias("y"),
        )
    )
