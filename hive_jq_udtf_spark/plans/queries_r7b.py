"""Round-7 wave 2 — two operator families the curation stack was
still missing:

- ``setsim_neardup`` — EXACT Jaccard threshold self-join via the
  AllPairs/PPJoin frequency-ordered prefix filter
  (operators/setsim.py): the guaranteed-complete counterpart to the
  probabilistic MinHash/SimHash tiers, bucketed on rare prefix
  tokens, never all-pairs.  The brute-force oracle double-checks the
  prefix filter's completeness claim pair-for-pair.
- ``embedding_pca_power`` — dominant principal component of the
  embedding covariance by power iteration (operators/pca.py): the
  distributed pass is the n*d^2 moment aggregation; the d x d solve
  is driver-side on the 6-dp-rounded matrix (corpus-size-independent
  collect), against a DuckDB oracle that unrolls the identical
  iteration in SQL.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES

# ---------------------------------------------------------------------------
# setsim_neardup — exact Jaccard >= 0.9 pairs, per-source rollup
# ---------------------------------------------------------------------------

_TAU_NUM, _TAU_DEN = 9, 10


def q_setsim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source_a, source_b) profile of ALL document pairs with
    whitespace-token Jaccard >= 0.9 — exact, via the prefix-filter
    join (operators/setsim.py).  Where minhash_neardup answers "find
    most near-dups cheaply", this answers "find EVERY pair above the
    bar and prove it": the contract a dedup audit or a legal
    data-provenance pass needs.  Sources are keyed unordered
    (source_a <= source_b lexically) so pair counts decompose into
    per-set source histograms.

    Scale shape — the pair set is quadratic inside duplicate
    clusters, so pairs are NEVER materialized per document:
    documents collapse to DISTINCT token sets first (one group-by),
    identical-set clusters contribute pure integer combinatorics on
    their per-source histograms (C(c,2) / c_a*c_b — zero rows per
    pair), and only CROSS-set near-dup candidates enter the prefix
    join, at set granularity.  A dup-heavy 100 TB corpus is exactly
    where the collapse wins: the prefix join's input is the distinct
    content, not the copies.  All-integer output: no float drift
    surface."""
    from ..operators.setsim import setsim_join_prefix

    docs = load_table(spark, sf_dir, "documents")
    # spread tokenization even when the source is a single row group
    # (the dedup.py idiom); the groupBy below shuffles anyway
    par = spark.sparkContext.defaultParallelism
    t = docs.repartition(par).select(
        "doc_id",
        "source",
        F.array_sort(
            F.array_distinct(
                F.expr("filter(split(text, ' '), x -> x != '')")
            )
        ).alias("canon"),
    ).where(F.size("canon") >= 1)

    # per-(set, source) histogram; set_id = min doc_id (deterministic)
    hist = t.groupBy("canon", "source").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("mid")
    )
    hist = hist.localCheckpoint(eager=True)  # feeds sets + within + 2 cross sides
    sets = hist.groupBy("canon").agg(F.min("mid").alias("set_id"))
    # measured: checkpointing beats recomputing sets per consumer
    # (4.27 vs 4.80 s warm at sf0.1) — it feeds reps + hid
    sets = sets.localCheckpoint(eager=True)

    # identical-set pairs: jacc = 10000 bp, all exact, counted not built
    h1 = hist.select("canon", F.col("source").alias("s1"), F.col("cnt").alias("c1"))
    h2 = hist.select("canon", F.col("source").alias("s2"), F.col("cnt").alias("c2"))
    within = (
        h1.join(h2, "canon")
        .where(F.col("s1") <= F.col("s2"))
        .select(
            F.col("s1").alias("source_a"),
            F.col("s2").alias("source_b"),
            F.when(
                F.col("s1") == F.col("s2"),
                (F.col("c1") * (F.col("c1") - 1)) / 2,
            )
            .otherwise(F.col("c1") * F.col("c2"))
            .cast("long")
            .alias("np"),
            F.lit(10000).cast("long").alias("jacc_bp"),
        )
        .where(F.col("np") > 0)
        .withColumn("nx", F.col("np"))
    )

    # cross-set near-dups: prefix join over DISTINCT sets only;
    # distinct canons => inter < union, so no exacts here
    reps = sets.select("set_id", "canon")
    pairs_sets = setsim_join_prefix(
        reps,
        id_col="set_id",
        tokens_col="canon",
        tau_num=_TAU_NUM,
        tau_den=_TAU_DEN,
    )
    hid = hist.join(sets, "canon").select("set_id", "source", "cnt")
    ha = hid.select(
        F.col("set_id").alias("id_a"),
        F.col("source").alias("sa"),
        F.col("cnt").alias("ca"),
    )
    hb = hid.select(
        F.col("set_id").alias("id_b"),
        F.col("source").alias("sb"),
        F.col("cnt").alias("cb"),
    )
    cross = (
        pairs_sets.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            (F.col("ca") * F.col("cb")).cast("long").alias("np"),
            F.col("jacc_bp"),
            F.lit(0).cast("long").alias("nx"),
        )
    )

    return (
        within.unionByName(cross)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("np").alias("n_pairs"),
            F.sum(F.col("np") * F.col("jacc_bp")).alias("sum_jacc_bp"),
            F.max("jacc_bp").alias("max_jacc_bp"),
            F.sum("nx").alias("n_exact"),
        )
        .orderBy("source_a", "source_b")
    )


# The oracle is deliberately brute force (per-DOCUMENT token bucket
# join with NO prefix filter and NO set collapse): a value match is a
# pair-for-pair proof that the prefix candidate rule plus the
# histogram combinatorics missed nothing at this tau.
_ORACLE_SETSIM = f"""
WITH tt AS (
  SELECT doc_id, source,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
  FROM documents),
t AS (SELECT doc_id, source, toks, len(toks) AS sz FROM tt WHERE len(toks) >= 1),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT ia, ib, i, sa.sz + sb.sz - i AS uni,
         least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b
  FROM inter JOIN t sa ON ia = sa.doc_id JOIN t sb ON ib = sb.doc_id
  WHERE {_TAU_DEN} * i >= {_TAU_NUM} * (sa.sz + sb.sz - i))
SELECT source_a, source_b,
       count(*) AS n_pairs,
       CAST(sum((10000 * i) // uni) AS BIGINT) AS sum_jacc_bp,
       CAST(max((10000 * i) // uni) AS BIGINT) AS max_jacc_bp,
       CAST(sum(CASE WHEN i = uni THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# embedding_pca_power — dominant principal component, K power steps
# ---------------------------------------------------------------------------

_PCA_ITERS = 12


def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus: one row
    per dimension with its loading (6 dp, sign-pinned) and the
    Rayleigh eigenvalue (4 dp).  The projection axis every whitening
    / PQ-rotation / drift-monitoring step needs first.

    Scale audit: the corpus-sized work is the single codegen moment
    aggregation inside covariance_matrix_rounded (map-combined to
    d^2/2 partials before one tiny shuffle); the collect and the
    iteration are O(d^2), constant in corpus size.  The oracle
    unrolls the same {_PCA_ITERS} steps in SQL from the identically
    rounded matrix, so equality holds to ~1e-14 against the 6-dp
    output round (+ 0.0 normalizes any -0.0 on both engines)."""
    from ..operators.pca import power_iteration_top_eig

    emb = load_table(spark, sf_dir, "embeddings")
    v, lam, d = power_iteration_top_eig(emb, "embedding", iters=_PCA_ITERS)
    rows = [
        (i, round(v[i], 6) + 0.0, round(lam, 4) + 0.0) for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "dim int, loading double, eigval double"
    )


def _gen_pca_oracle(iters: int = _PCA_ITERS) -> str:
    steps = []
    prev = "v0"
    for k in range(1, iters + 1):
        steps.append(
            f"w{k} AS MATERIALIZED (SELECT cov.i AS i, sum(cov.c * {prev}.v) AS w"
            f" FROM cov JOIN {prev} ON cov.j = {prev}.i GROUP BY 1),\n"
            f"n{k} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS n FROM w{k}),\n"
            f"v{k} AS MATERIALIZED (SELECT i, w / n AS v FROM w{k} CROSS JOIN n{k})"
        )
        prev = f"v{k}"
    chain = ",\n".join(steps)
    return f"""
WITH flat AS MATERIALIZED (
  SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)),
means AS (SELECT i, avg(x) AS mu FROM flat GROUP BY 1),
prods AS (
  SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2),
cov_ut AS (
  SELECT p.i, p.j, round(p.exy - mi.mu * mj.mu, 6) AS c
  FROM prods p JOIN means mi ON p.i = mi.i JOIN means mj ON p.j = mj.i),
cov AS MATERIALIZED (SELECT i, j, c FROM cov_ut
        UNION ALL SELECT j AS i, i AS j, c FROM cov_ut WHERE i < j),
dd AS (SELECT max(i) + 1 AS d FROM cov),
v0 AS (SELECT i, 1.0 / sqrt(d) AS v
       FROM (SELECT DISTINCT i FROM cov) CROSS JOIN dd),
{chain},
wf AS MATERIALIZED (SELECT cov.i AS i, sum(cov.c * {prev}.v) AS w
       FROM cov JOIN {prev} ON cov.j = {prev}.i GROUP BY 1),
lam AS (SELECT sum({prev}.v * wf.w) AS l
        FROM {prev} JOIN wf ON {prev}.i = wf.i),
sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
        FROM {prev} ORDER BY abs(v) DESC, i LIMIT 1)
SELECT CAST({prev}.i AS INTEGER) AS dim,
       round(sgn.s * {prev}.v, 6) + 0.0 AS loading,
       round(lam.l, 4) + 0.0 AS eigval
FROM {prev} CROSS JOIN sgn CROSS JOIN lam ORDER BY dim
"""


QUERIES["setsim_neardup"] = q_setsim_neardup
ORACLES["setsim_neardup"] = _ORACLE_SETSIM
QUERIES["embedding_pca_power"] = q_embedding_pca_power
ORACLES["embedding_pca_power"] = _gen_pca_oracle()
