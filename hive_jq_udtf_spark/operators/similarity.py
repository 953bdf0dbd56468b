"""Similarity search over embedding columns (SURVEY §2.6).

Embeddings are ``array<float>`` columns; all math runs in JVM
higher-order expressions (zip_with / aggregate) in double precision
— no Python worker anywhere.

- brute_force_topk: exact cosine top-k.  Norms are precomputed per
  side *before* the join; the query side is broadcast (top-k search
  with a small query set against a huge corpus is the common shape —
  corpus is never shuffled, each partition scores its slice and the
  final top-k is a cheap window over k×|queries| rows).
- srp_topk: sign-random-projection LSH bucketing + exact re-rank
  within buckets — the approximate scale path when the query set is
  also huge (turns the cross join into an equi-join on bucket).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _id_spark_type(df: DataFrame, id_col: str) -> str:
    """DDL string of the id column's type, so kernels preserve
    arbitrary id types (bigint, string, ...) end-to-end."""
    return df.schema[id_col].dataType.simpleString()


def _id_numpy(pdf, id_col: str):
    import numpy as np

    arr = pdf[id_col].to_numpy()
    return arr if arr.dtype != object else np.asarray(arr, dtype=object)


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def dist2_col(a: Column, b: Column) -> Column:
    """Squared euclidean distance — the shared kernel for DBSCAN's
    eps-neighbor join (and any fixed-radius similarity join); same
    left-to-right fold order as dot_col/norm_col so all vector math
    in the repo produces identical doubles for identical inputs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "__norm") -> DataFrame:
    return df.withColumn("__vec_d", _to_double(F.col(vec_col))).withColumn(
        out, norm_col(F.col("__vec_d"))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    Returns (query_id, neighbor_id, rank, cosine); ties broken by
    neighbor_id for determinism.

    Physical strategy: the (small) query side is collected and
    broadcast as a float64 unit matrix; each corpus partition scores
    its block with ONE vectorized matmul and emits only its block's
    top-k per query under the exact global ordering (-cosine,
    neighbor_id) — partial top-k is safe because any global top-k
    row is in its block's top-k under the same total order.  The
    final window then ranks k × blocks candidates per query instead
    of the whole corpus.  The corpus is never shuffled or collected,
    so the shape scales to an arbitrarily large corpus; zero vectors
    (undefined cosine) are dropped in the kernel."""
    import numpy as np

    spark = queries.sparkSession
    id_t = _id_spark_type(queries, id_col)
    qrows = queries.select(id_col, vec_col).collect()
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, cosine double"
    if not qrows:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(0)).select(
            "query_id", "neighbor_id", "rank", "cosine"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm[qnorm == 0.0] = np.nan
    qunit = qmat / qnorm[:, None]
    bc = spark.sparkContext.broadcast((qids, qunit))

    def score_block(batches):
        import pandas as pd

        q_ids, q_unit = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = _id_numpy(pdf, id_col)
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cn = np.sqrt((cmat * cmat).sum(axis=1))
            cn[cn == 0.0] = np.nan
            cunit = cmat / cn[:, None]
            sims = q_unit @ cunit.T  # (n_queries, block)
            out_q, out_n, out_c = [], [], []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                ok = ~np.isnan(row)
                if not ok.any():
                    continue
                cand_ids, cand_sims = cids[ok], row[ok]
                # stable two-key sort that also supports string ids:
                # sort by id first (stable), then by -cosine
                by_id = np.argsort(cand_ids, kind="stable")
                order = by_id[np.argsort(-cand_sims[by_id], kind="stable")][:k]
                out_q.append(np.full(len(order), q_ids[qi]))
                out_n.append(cand_ids[order])
                out_c.append(cand_sims[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score_block, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_bucket_col(vec_d: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: packed sign bits of the dot
    products with fixed hyperplanes (literal arrays — codegen)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        d = dot_col(vec_d, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket; exact
    cosine re-rank within candidates.  The cross join becomes an
    equi-join on bucket — shuffle keyed by bucket, O(n/2^planes)
    expected candidates per query."""
    planes = _random_hyperplanes(dim, n_planes, seed)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    q = q.withColumn("bucket", srp_bucket_col(F.col("qv"), planes))
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec_d").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    c = c.withColumn("bucket", srp_bucket_col(F.col("cv"), planes))
    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_cells_codegen(
    df: DataFrame,
    centroids,  # sequence of dim-length float sequences (small C)
    n_assign: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse assignment as PURE whole-stage codegen — zero
    Python in the plan: per-centroid squared L2 is the shared
    ``dist2_col`` fold against an array *literal*, and cell ranking
    is ``array_sort`` over (d2, cell) structs (ties break on cell
    id, exactly like ``ivf_assign_cells`` / the SQL oracles).

    Returns (id, cell, probe_rank) with probe_rank 1..n_assign.

    Use when the centroid count is small enough to unroll into the
    plan (each centroid becomes one literal array — fine for the
    coarse quantizers that gate candidate generation); the
    Arrow-batched ``ivf_assign_cells`` remains the path for large C.
    The fold order matches the left-to-right ``(..)+(..)+...`` SQL
    unroll term-for-term, so assignment is cross-engine exact."""
    n_assign = min(n_assign, len(centroids))
    vec_d = _to_double(F.col(vec_col))
    structs = []
    for ci, cent in enumerate(centroids):
        lit_arr = F.array(*[F.lit(float(x)) for x in cent])
        structs.append(
            F.struct(
                dist2_col(vec_d, lit_arr).alias("d"),
                F.lit(ci).cast("bigint").alias("c"),
            )
        )
    ranked = F.slice(F.array_sort(F.array(*structs)), 1, n_assign)
    return df.select(
        F.col(id_col), F.posexplode(ranked).alias("_pos", "_dc")
    ).select(
        id_col,
        F.col("_dc.c").alias("cell"),
        (F.col("_pos") + 1).cast("int").alias("probe_rank"),
    )


def ivf_assign_cells(
    df: DataFrame,
    centroids,  # numpy (C, dim) float64
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: for each vector, the ``n_probe``
    nearest centroid cells by squared L2 (ties broken by cell id).
    Centroid matrix is broadcast; assignment is one vectorized
    numpy distance computation per Arrow batch.

    Returns (id, cell, probe_rank) with probe_rank 1..n_probe —
    n_probe=1 for corpus indexing, >1 for query-side multi-probe."""
    import numpy as np

    spark = df.sparkSession
    cmat = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(cmat))  # can't probe more cells than exist
    id_t = _id_spark_type(df, id_col)
    bc = spark.sparkContext.broadcast(cmat)

    def assign(batches):
        import pandas as pd

        cm = bc.value
        c_sq = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = _id_numpy(pdf, id_col)
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            # full squared distance, same term order as the SQL oracle:
            # sum_i (v_i - c_i)^2 accumulated left-to-right (numpy is
            # sequential below its pairwise-blocksize for dim <= 128)
            d2 = ((vm[:, None, :] - cm[None, :, :]) ** 2).sum(axis=-1)
            # rank cells by (d2, cell_id); stable argsort breaks d2 ties
            # in cell-id order, matching the oracle's ORDER BY d2, cid
            top = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            n = len(ids)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_probe),
                    "cell": top.ravel().astype(np.int64),
                    "probe_rank": np.tile(np.arange(1, n_probe + 1), n),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} {id_t}, cell bigint, probe_rank int"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,  # numpy (C, dim) float64 — trained offline / supplied
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors are bucketed into
    their nearest centroid cell; each query probes its ``n_probe``
    nearest cells and exact-cosine re-ranks only those candidates.

    This is the inverted-file scale path: the corpus shuffles ONCE
    on cell id (cardinality = n_cells, tunable to the cluster), the
    per-query candidate set is |corpus|·n_probe/n_cells, and the
    centroid matrix is the only broadcast state.  Centroids are
    supplied externally (trained offline — at 100 TB you sample and
    train once, then assignment is embarrassingly parallel), which
    also keeps the operator deterministic."""
    c_cells = ivf_assign_cells(corpus, centroids, 1, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    q_cells = ivf_assign_cells(queries, centroids, n_probe, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), "cell"
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec_d").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    cand = (
        c_cells.join(F.broadcast(q_cells), on="cell")
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(c, on="neighbor_id")
        .join(F.broadcast(q), on="query_id")
        .withColumn(
            "cosine", dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pairwise_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_blocks: int = 8,
    small_corpus: bool = False,
) -> DataFrame:
    """All pairs above a cosine threshold (embedding near-dup
    detection).  Exact — every qualifying pair is emitted once, as
    (vec_a, vec_b, cosine) with vec_a < vec_b.

    Default physical strategy (scales past driver/executor memory):
    TILED self-join.  Rows are hashed into ``n_blocks`` blocks; the
    unordered block pairs (i ≤ j) are tiles; each row is replicated
    to the ``n_blocks`` tiles containing its block; one
    groupBy(tile).applyInPandas computes each tile's Gram matrix as
    a single float64 matmul.  Nothing is ever collected to the
    driver and no broadcast grows with the corpus: shuffle volume is
    N·n_blocks vectors and per-task memory is ~2·N/n_blocks rows, so
    n_blocks tunes the memory/replication trade-off (at 100 TB pick
    n_blocks so a block fits an executor; the O(N²) matmul work is
    intrinsic to the exact operator — use minhash/simhash/SRP for
    the sub-quadratic approximate path).

    ``small_corpus=True`` selects the broadcast kernel instead: the
    corpus is collected once, broadcast, and each partition matmuls
    its slice against it — fastest shape while one side fits in
    memory, wrong shape beyond that."""
    if small_corpus:
        return _pairwise_cosine_broadcast(df, vec_col, id_col, threshold)
    return _pairwise_cosine_tiled(df, vec_col, id_col, threshold, n_blocks)


def _pairwise_cosine_tiled(
    df: DataFrame, vec_col: str, id_col: str, threshold: float, n_blocks: int
) -> DataFrame:
    import numpy as np

    id_t = _id_spark_type(df, id_col)
    out_schema = f"vec_a {id_t}, vec_b {id_t}, cosine double"
    src = df.select(id_col, vec_col).withColumn(
        "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    )
    # replicate each row into every tile (min(blk,t), max(blk,t)); the
    # n_blocks tiles of one row are distinct, and an unordered pair of
    # rows shares exactly ONE tile — each pair is scored exactly once
    tiles = F.array(
        *[
            F.struct(
                F.least(F.col("__blk"), F.lit(t)).alias("ta"),
                F.greatest(F.col("__blk"), F.lit(t)).alias("tb"),
            )
            for t in range(n_blocks)
        ]
    )
    rep = src.withColumn("__t", F.explode(tiles)).select(
        F.col("__t.ta").alias("__ta"),
        F.col("__t.tb").alias("__tb"),
        "__blk",
        id_col,
        vec_col,
    )

    def tile_gram(key, pdf):
        import pandas as pd

        ta, tb = int(key[0]), int(key[1])
        ids = _id_numpy(pdf, id_col)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = np.nan  # zero vectors never match
        unit = mat / norms[:, None]
        empty = pd.DataFrame({"vec_a": ids[:0], "vec_b": ids[:0], "cosine": []})
        if ta == tb:
            sims = unit @ unit.T
            with np.errstate(invalid="ignore"):
                ii, jj = np.nonzero(
                    (sims >= threshold) & (ids[:, None] < ids[None, :])
                )
            if not len(ii):
                return empty
            return pd.DataFrame(
                {"vec_a": ids[ii], "vec_b": ids[jj], "cosine": sims[ii, jj]}
            )
        ma = pdf["__blk"].to_numpy() == ta
        a_ids, a_unit = ids[ma], unit[ma]
        b_ids, b_unit = ids[~ma], unit[~ma]
        if not len(a_ids) or not len(b_ids):
            return empty
        sims = a_unit @ b_unit.T
        with np.errstate(invalid="ignore"):
            ii, jj = np.nonzero(sims >= threshold)
        if not len(ii):
            return empty
        xa, xb, cs = a_ids[ii], b_ids[jj], sims[ii, jj]
        swap = xa > xb  # emit with vec_a < vec_b regardless of block order
        return pd.DataFrame(
            {
                "vec_a": np.where(swap, xb, xa),
                "vec_b": np.where(swap, xa, xb),
                "cosine": cs,
            }
        )

    return rep.groupBy("__ta", "__tb").applyInPandas(tile_gram, out_schema)


def _pairwise_cosine_broadcast(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", threshold: float = 0.9
) -> DataFrame:
    """Broadcast kernel (small-corpus fast path): the corpus is
    collected once as an (ids, float64 matrix) pair and broadcast to
    every task; each input partition then computes its block × corpus
    Gram matrix as one vectorized matmul (Arrow batch in → numpy BLAS
    → Arrow out).  No join, no shuffle — but the driver holds the
    whole corpus, so this is ONLY valid while one side fits in
    driver/executor memory (a 10M×256-dim float64 corpus is ~20 GB);
    pairwise_cosine's default tiled kernel is the scale path."""
    import numpy as np

    spark = df.sparkSession
    id_t = _id_spark_type(df, id_col)
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        return spark.createDataFrame([], f"vec_a {id_t}, vec_b {id_t}, cosine double")
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = np.nan  # zero vectors never match (cosine undefined)
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    def gram(batches):
        import pandas as pd

        all_ids, all_unit = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bids = _id_numpy(pdf, id_col)
            bmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bnorm = np.sqrt((bmat * bmat).sum(axis=1))
            bnorm[bnorm == 0.0] = np.nan
            bunit = bmat / bnorm[:, None]
            sims = bunit @ all_unit.T
            ii, jj = np.nonzero((sims >= threshold) & (bids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": bids[ii], "vec_b": all_ids[jj], "cosine": sims[ii, jj]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        gram, f"vec_a {id_t}, vec_b {id_t}, cosine double"
    )


def train_centroids(
    df: DataFrame,
    n_cells: int = 64,
    sample_n: int = 100_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Deterministic IVF centroid training: HASH-stable sample of up
    to ``sample_n`` vectors (ordered by md5 of the vector's JSON —
    invariant to partitioning, cluster size, and row order, unlike a
    bare limit()), then ``iters`` Lloyd iterations in numpy with a
    seeded init.  Returns a (n_cells, dim) float64 matrix for
    ivf_topk.

    Scale shape: training sorts only (hash, vector) pairs and
    collects the sample; assignment afterwards is embarrassingly
    parallel.  Fully deterministic — same data, same centroids,
    every run.  Distances use the ||x||² + ||c||² − 2·X·Cᵀ expansion:
    memory is O(N·k), not O(N·k·dim) (at the defaults with dim=384 a
    broadcast difference tensor would be ~20 GB)."""
    import numpy as np

    rows = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.md5(F.to_json(F.col(vec_col))))
        .limit(sample_n)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    if len(X) < n_cells:
        raise ValueError(f"sample ({len(X)}) smaller than n_cells ({n_cells})")
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    x_sq = (X * X).sum(axis=1)
    for _ in range(iters):
        c_sq = (cent * cent).sum(axis=1)
        d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * (X @ cent.T)  # (N, k)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression ANN leg
# ---------------------------------------------------------------------------


def pq_encode(
    corpus: DataFrame,
    centroids,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector into m subspace codes (the PQ codebook of
    Jégou, Douze & Schmid 2011): split dims into m blocks, assign each
    block to its nearest sub-centroid (ties → lowest centroid id,
    matching SQL row_number order).

    One Arrow-batched pass over the corpus, no shuffle: at 100 TB the
    64-dim float vector (256 B) compresses to m bytes of codes and the
    encode is embarrassingly parallel.  ``centroids`` is a (K, dim)
    float64 array supplied externally (deterministic — the oracle
    replicates the same arithmetic term-for-term)."""
    import numpy as np

    K, dim = centroids.shape
    sub = dim // m
    cent = centroids.reshape(K, m, sub)
    id_type = _id_spark_type(corpus, id_col)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64).reshape(-1, m, sub)
            # d2: (n, K, m); block sums are over 8 contiguous elements
            # → numpy reduces sequentially, same order as the SQL chain
            d2 = ((V[:, None, :, :] - cent[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=1).astype("int32")  # (n, m), first-min
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    centroids,
    m: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query build
    the m×K lookup table of block distances (driver-side numpy over
    the SMALL query side, broadcast), then the probe is pure codegen —
    m element_at additions per (query, code-row) pair, no Python, no
    per-dim work.  Returns (query_id, neighbor_id, rank, adc)."""
    import numpy as np

    K, dim = centroids.shape
    sub = dim // m
    cent = centroids.reshape(K, m, sub)

    qrows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    spark = queries.sparkSession
    lut_rows = []
    for r in qrows:
        Q = np.array(r[vec_col], dtype=np.float64).reshape(m, sub)
        # lut[j, c] = ||q_block_j − cent_c_block_j||², flattened j-major
        lut = ((Q[None, :, :] - cent) ** 2).sum(axis=2).T.reshape(-1)
        lut_rows.append((r[id_col], [float(x) for x in lut]))
    # preserve the query table's id type (string/int/long ids all
    # valid), like every other kernel in this module
    id_type = _id_spark_type(queries, id_col)
    lut_df = spark.createDataFrame(
        lut_rows, f"query_id {id_type}, lut array<double>"
    )

    adc = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"), (F.lit(j * K) + F.element_at(F.col("codes"), j + 1) + 1).cast("int")
        )
        adc = term if adc is None else (adc + term)
    scored = codes.crossJoin(F.broadcast(lut_df)).select(
        "query_id", F.col(id_col).alias("neighbor_id"), adc.alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("adc", 4).alias("adc"))
    )


def semantic_dedup(
    df: DataFrame,
    centroids,  # numpy (C, dim) float64 — trained offline / supplied
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    coarse-cluster the corpus into centroid cells, then drop the
    higher-id member of every WITHIN-CELL pair whose cosine ≥
    threshold.  Returns the surviving (id, cell) rows.

    This is the scale shape that makes embedding dedup tractable at
    100 TB: the quadratic pairwise step is confined to one cell
    (|cell| ≈ N/C — pick C so a cell's Gram fits an executor), the
    corpus shuffles once on cell id, and cross-cell pairs are never
    materialized (the documented recall trade-off vs the exact
    pairwise_cosine operator).  Centroids are supplied externally and
    assignment is deterministic (ties by cell id), so a SQL oracle
    can replicate the pruning decision for decision.
    """
    cells = ivf_assign_cells(df, centroids, 1, vec_col, id_col).select(
        id_col, "cell"
    )
    normed = with_norm(df, vec_col).select(
        id_col, F.col("__vec_d").alias("v"), F.col("__norm").alias("n")
    )
    m = cells.join(normed, id_col)
    a = m.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = m.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    losers = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return cells.join(losers, id_col, "left_anti").select(id_col, "cell")
