"""Round-5 continuation wave C: four more LLM-training-pipeline
operators over documents/embeddings — asymmetric containment near-dup
(catches quote/superset duplication that symmetric Jaccard misses),
a bigram language model with add-one smoothing scoring held-out
perplexity, covariance mining across embedding dimensions, and
PMI-ranked collocation extraction.  Same discipline as the dedup/ANN
family (VERDICT r4): every quadratic step is bounded (shingle
document-frequency cap, per-vector dim pairs), all joins key on
content hashes or ids, no Python in any hot path.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# containment_neardup — asymmetric |A∩B|/|A| over 3-gram shingles
# ---------------------------------------------------------------------------


def q_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup join: emits (contained, container) pairs
    where ≥ 70 % of doc A's distinct word-3-grams also occur in B.
    Unlike Jaccard, containment is ASYMMETRIC — it catches a short
    document wholly quoted inside a longer one, the dominant
    contamination shape in web corpora.  The candidate generator is
    the shingle inverted index with a document-frequency cap (df ≤ 20
    here): a shingle occurring in more than df_max docs contributes
    O(df²) candidate pairs and almost no discrimination, so dropping
    it bounds the join fan-out — the standard scalability lever for
    set-similarity joins (same family as dedup.py:124's prefix
    filter).  One shuffle on the shingle hash, one on the pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    # shingles are carried as xxhash64 fingerprints from the start:
    # the distinct / df-count / self-join all shuffle 8-byte longs
    # instead of ~25-byte gram strings (the same fingerprinting the
    # MinHash/fingerprint dedup family uses, dedup.py:91); grams is
    # consumed by three downstream aggregations, so materialize the
    # exploded+distinct pass once instead of recomputing it per branch
    # r15 (guide §2.4): lay the gram stream out hash(sh) ONCE in a
    # partitioning-preserving persist (the pagerank/LPA edge idiom —
    # a localCheckpoint's LogicalRDD loses outputPartitioning under
    # AQE and every consumer re-exchanges): the (doc_id, sh) distinct
    # (its clustering is satisfied by the sh subset), the df count,
    # the rare join and the sh self-join below then all reuse the one
    # exchange; only the per-doc size count and the pair aggregation
    # still shuffle.  The repartition carries the same rows the
    # distinct exchange used to.
    from ..operators.layout import _ring_persist

    grams = _ring_persist(
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 2, 0)),"
                    " (t, i) -> xxhash64(concat_ws(' ', t, ts[i + 1], ts[i + 2])))"
                )
            ).alias("sh"),
        )
        .repartition(F.col("sh"))
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    rare = grams.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= 20)
    g = grams.join(rare.select("sh"), "sh")
    # |A∩B| is symmetric, so join and aggregate each unordered pair
    # ONCE (doc_a < doc_b halves the pair fan-out) and emit both
    # orientations afterwards — the asymmetry lives only in the
    # denominator applied below
    half = (
        g.alias("a")
        .join(g.alias("b"), "sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("lo"),
            F.col("b.doc_id").alias("hi"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    pairs = half.select(
        F.col("lo").alias("contained"), F.col("hi").alias("container"), "common"
    ).unionByName(
        half.select(
            F.col("hi").alias("contained"), F.col("lo").alias("container"), "common"
        )
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "contained"), "contained")
        .where(F.col("common") * 1.0 / F.col("n") >= 0.7)
        .select(
            "contained",
            "container",
            F.col("n").alias("n_grams"),
            F.round(F.col("common") * 1.0 / F.col("n"), 4).alias("containment"),
        )
        .orderBy("contained", "container")
    )


_ORACLE_CONTAINMENT = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(ts) - 2)) AS i, ts FROM t),
g0 AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh FROM s),
sz AS (SELECT doc_id, count(*) AS n FROM g0 GROUP BY doc_id),
rare AS (SELECT sh FROM g0 GROUP BY sh HAVING count(*) <= 20),
g AS (SELECT g0.doc_id, g0.sh FROM g0 JOIN rare USING (sh)),
pairs AS (
  SELECT a.doc_id AS contained, b.doc_id AS container, count(*) AS common
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT contained, container, CAST(sz.n AS BIGINT) AS n_grams,
       round(common * 1.0 / sz.n, 4) AS containment
FROM pairs JOIN sz ON sz.doc_id = contained
WHERE common * 1.0 / sz.n >= 0.7
ORDER BY contained, container
"""


# ---------------------------------------------------------------------------
# bigram_ppl — add-one-smoothed bigram LM, held-out perplexity by lang
# ---------------------------------------------------------------------------


def q_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model with add-one smoothing: train counts on
    even doc_ids, score odd doc_ids, report average perplexity per
    language.  p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V); unseen histories
    fall back to 1/V via the same formula (left joins keep nulls →
    coalesce 0).  The model IS two count tables — the scoring pass is
    a join of held-out bigrams against them, shuffling on the bigram
    key once; V is a scalar broadcast.  This is the cheap quality
    signal (alongside unigram_ppl) a pretraining pipeline computes
    per-shard to rank sources; counts are mergeable so the train
    aggregation map-combines at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("ts")
    )
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                " (t, i) -> struct(t AS w1, ts[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.w1", "p.w2")
    train = bg.where(F.col("doc_id") % 2 == 0)
    test = bg.where(F.col("doc_id") % 2 == 1)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = train.agg(
        F.countDistinct("w1").alias("v")
    )  # histories seen in training (add-one denominator)
    scored = (
        test.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.exp(-F.avg("lp")).alias("ppl")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ppl"), 2).alias("avg_ppl"),
        )
        .orderBy("lang")
    )


_ORACLE_BIGRAM_PPL = """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
bg AS (
  SELECT doc_id, lang, ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT doc_id, lang, unnest(generate_series(1, len(ts) - 1)) AS i, ts FROM t)),
train AS (SELECT * FROM bg WHERE doc_id % 2 = 0),
test AS (SELECT * FROM bg WHERE doc_id % 2 = 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY 1),
v AS (SELECT count(DISTINCT w1) AS v FROM train),
scored AS (
  SELECT te.doc_id, te.lang,
         ln((coalesce(c2.c2, 0) + 1.0) / (coalesce(c1.c1, 0) + v.v)) AS lp
  FROM test te
  LEFT JOIN c2 ON te.w1 = c2.w1 AND te.w2 = c2.w2
  LEFT JOIN c1 ON te.w1 = c1.w1
  CROSS JOIN v),
per_doc AS (SELECT doc_id, lang, exp(-avg(lp)) AS ppl FROM scored GROUP BY 1, 2)
SELECT lang, count(*) AS n_docs, round(avg(ppl), 2) AS avg_ppl
FROM per_doc GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# embedding_covariance — strongest off-diagonal covariance pairs
# ---------------------------------------------------------------------------


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-covarying embedding-dimension pairs: population
    covariance cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ] computed from a
    posexplode of the vector column and a per-vector self-join on
    (vec_id, i < j).  The work is n·d²/2 products — inherent to exact
    covariance — executed entirely in whole-stage codegen; at 100 TB
    you keep d² per-partition partial sums (the groupBy map-combines
    to d²/2 rows before the single tiny shuffle).  Detects redundant /
    entangled dimensions before whitening or PQ codebook training."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnsRenamed({"pos": "i", "col": "x"})
    means = flat.groupBy("i").agg(F.avg("x").alias("mu"))
    a, b = flat.alias("a"), flat.alias("b")
    prods = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.avg(F.col("a.x") * F.col("b.x")).alias("exy"))
    )
    cov = (
        prods.join(F.broadcast(means.withColumnsRenamed({"i": "i", "mu": "mu_i"})), "i")
        .join(
            F.broadcast(means.withColumnsRenamed({"i": "j", "mu": "mu_j"})), "j"
        )
        .select(
            "i",
            "j",
            F.round(F.col("exy") - F.col("mu_i") * F.col("mu_j"), 6).alias("cov"),
        )
    )
    return cov.orderBy(F.desc(F.abs(F.col("cov"))), "i", "j").limit(10)


_ORACLE_EMB_COV = """
WITH flat AS (
  SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)),
means AS (SELECT i, avg(x) AS mu FROM flat GROUP BY 1),
prods AS (
  SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i < b.i
  GROUP BY 1, 2),
cov AS (
  SELECT p.i, p.j, round(p.exy - mi.mu * mj.mu, 6) AS cov
  FROM prods p JOIN means mi ON p.i = mi.i JOIN means mj ON p.j = mj.i)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, cov
FROM cov ORDER BY abs(cov) DESC, i, j LIMIT 10
"""


# ---------------------------------------------------------------------------
# bigram_pmi — PMI-ranked collocations
# ---------------------------------------------------------------------------


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent word pairs by pointwise
    mutual information, PMI = ln(p(ab)/(p(a)p(b))) with a min-count
    floor of 5 (the floor removes the low-count PMI explosion — the
    standard Church–Hanks discipline).  Complements the frequency-
    ranked bpe_merge_candidates: PMI surfaces *associated* pairs, not
    merely frequent ones.  Three mergeable count aggregations and two
    broadcast scalars — fully map-combining at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    uni = toks.select(F.explode("ts").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cw")
    )
    n_tok = uni.agg(F.sum("cw").alias("n"))
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                " (t, i) -> struct(t AS w1, ts[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cab"))
    n_bg = cbg.agg(F.sum("cab").alias("b"))
    pmi = (
        cbg.where(F.col("cab") >= 5)
        .join(uni.withColumnsRenamed({"w": "w1", "cw": "c1"}), "w1")
        .join(uni.withColumnsRenamed({"w": "w2", "cw": "c2"}), "w2")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_bg))
        .select(
            "w1",
            "w2",
            F.col("cab").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("cab") / F.col("b"))
                    / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return pmi.orderBy(F.desc("pmi"), "w1", "w2").limit(20)


_ORACLE_BIGRAM_PMI = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
uni AS (
  SELECT w, count(*) AS cw
  FROM (SELECT unnest(ts) AS w FROM t) GROUP BY 1),
n AS (SELECT sum(cw) AS n FROM uni),
bg AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT unnest(generate_series(1, len(ts) - 1)) AS i, ts FROM t)),
cbg AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2),
b AS (SELECT sum(cab) AS b FROM cbg)
SELECT w1, w2, cab AS pair_count,
       round(ln((cab / b.b) / ((u1.cw / n.n) * (u2.cw / n.n))), 4) AS pmi
FROM cbg JOIN uni u1 ON cbg.w1 = u1.w JOIN uni u2 ON cbg.w2 = u2.w
CROSS JOIN n CROSS JOIN b
WHERE cab >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


QUERIES["containment_neardup"] = q_containment_neardup
ORACLES["containment_neardup"] = _ORACLE_CONTAINMENT
QUERIES["bigram_ppl"] = q_bigram_ppl
ORACLES["bigram_ppl"] = _ORACLE_BIGRAM_PPL
QUERIES["embedding_covariance"] = q_embedding_covariance
ORACLES["embedding_covariance"] = _ORACLE_EMB_COV
QUERIES["bigram_pmi"] = q_bigram_pmi
ORACLES["bigram_pmi"] = _ORACLE_BIGRAM_PMI
