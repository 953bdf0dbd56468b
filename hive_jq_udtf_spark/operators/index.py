"""Full-text indexing / retrieval operators for training-data
pipelines: inverted-index build (posting lists) and BM25 ranked
retrieval.

Scale design (100 TB corpus, 1000 executors):

- ``build_postings`` is explode → groupBy(token, doc).  The shuffle
  carries one record per *distinct* (token, doc) pair per map
  partition (partial aggregation combines duplicate terms map-side),
  not one per token occurrence.  Posting lists themselves are only
  materialized per-token downstream (collect_list inside a token
  group), never on the driver.
- ``bm25_topk`` filters to the query's terms BEFORE the shuffle —
  the exploded stream is pruned to O(matching occurrences), so the
  aggregation is proportional to the posting lists of the query
  terms, not the corpus.  Corpus-level constants (N, avgdl) are a
  single-row aggregate combined via a broadcast 1×1 cross join (no
  driver collect); per-term document frequencies are a tiny
  broadcast join (|terms| rows).
- Stopword-grade tokens are the classic skew hazard for the
  *build*: the groupBy key is (token, doc) — already fine-grained —
  and the per-token second level aggregates counts only, so a
  billion-doc stopword posting reduces to counters, not a list.
  ``build_postings(sample_cap=...)`` truncates stored posting-list
  prefixes with slice-after-sort, keeping the materialized index
  entry bounded per token.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(docs: DataFrame, text_col: str = "text"):
    """Lowercased whitespace tokens as an array column (empty strings
    dropped so split artifacts don't become terms)."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    return arr


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index postings: one row per (token, doc) with the
    term frequency.  This is the index-build primitive; downstream
    aggregations (df, cf, posting lists) derive from it."""
    arr = tokenize(docs, text_col)
    ex = docs.select(F.col(id_col).alias("doc_id"), F.explode(arr).alias("token"))
    return ex.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))


def index_summary(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 15,
    sample_cap: int = 5,
) -> DataFrame:
    """Materialized index entries for the ``top`` tokens by document
    frequency: df, collection frequency, max tf, and the first
    ``sample_cap`` posting doc_ids (sorted) — the bounded-prefix form
    a 100 TB index would store for hot tokens."""
    postings = build_postings(docs, text_col, id_col)
    return (
        postings.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, sample_cap).alias(
                "posting_prefix"
            ),
        )
        .orderBy(F.desc("df"), "token")
        .limit(top)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Walker's classic
    formula with the +1 idf floor, as popularized by Lucene):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Scores are rounded to 4 dp before ordering so the ranking is
    deterministic across engines (ties broken by doc_id)."""
    arr = tokenize(docs, text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.size(arr).alias("dl"), arr.alias("toks")
    )
    # corpus constants: single-row aggregate, broadcast-crossed in
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # prune to the query's terms BEFORE the shuffle
    ex = base.select(
        "doc_id", "dl", F.explode("toks").alias("token")
    ).where(F.col("token").isin(query_terms))
    tf = ex.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weighting
# ---------------------------------------------------------------------------


def _md5_bucket(col, buckets: int):
    """Portable deterministic bucket (same construction DuckDB can
    evaluate: first 60 bits of md5 hex → BIGINT → mod)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % buckets
    )


def importance_weights(
    docs: DataFrame,
    target_pred,
    buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weights for target-distribution
    resampling, following the hashed n-gram construction of DSIR
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023 — public paper):

    1. hash every unigram into ``buckets`` buckets,
    2. estimate the bucket distribution of the TARGET slice
       (rows where ``target_pred`` holds) and of the RAW corpus,
       with add-``alpha`` smoothing,
    3. score each document by  Σ_tokens  ln p̂_target(b(tok)) −
       ln p̂_raw(b(tok)).

    Returns (doc_id, log_weight).  Scale: the two distributions are
    ``buckets``-row aggregates (broadcast); the rescoring pass is one
    explode + broadcast join + groupBy(doc_id) with map-side partial
    sums — no corpus-sized shuffle beyond the doc_id aggregation.
    """
    arr = tokenize(docs, text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(arr).alias("token"),
    ).withColumn("bucket", _md5_bucket(F.col("token"), buckets))

    # raw + target bucket counts in ONE pass over the exploded stream
    # (a separate .where(is_target) aggregation would re-explode the
    # corpus a second time)
    counts = toks.groupBy("bucket").agg(
        F.count("*").alias("raw_n"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tgt_n"),
    )
    # dense bucket table so unseen buckets still get smoothed mass
    all_buckets = docs.sparkSession.range(buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    dist = all_buckets.join(F.broadcast(counts), "bucket", "left").na.fill(
        {"raw_n": 0, "tgt_n": 0}
    )
    totals = dist.agg(
        F.sum("raw_n").alias("raw_total"), F.sum("tgt_n").alias("tgt_total")
    )
    log_ratio = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("tgt_n") + alpha) / (F.col("tgt_total") + alpha * buckets))
                - F.log((F.col("raw_n") + alpha) / (F.col("raw_total") + alpha * buckets))
            ).alias("log_ratio"),
        )
    )
    return (
        toks.join(F.broadcast(log_ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("log_ratio"), 4).alias("log_weight"))
    )


def importance_resample(
    weights: DataFrame,
    k: int,
    seed: str = "dsir-seed",
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """DSIR step 2: sample ``k`` documents WITHOUT replacement with
    probability ∝ exp(log_weight), via the Gumbel-top-k trick
    (Vieira 2014; Kool et al. 2019 — public):

        key(d) = log_weight(d) + Gumbel(d),   take the k largest.

    The Gumbel noise is DETERMINISTIC: u(d) is derived from
    md5(seed ‖ doc_id) mapped into (0, 1), so the sample is
    reproducible across runs, engines, and partitionings — the
    property a 100 TB curation pipeline needs for auditability.
    Scale: per-row arithmetic + one global top-k (TakeOrderedAndProject,
    no full sort).  Keys are rounded to 4 dp before ranking so the
    float ordering is engine-portable (ties broken by doc_id)."""
    hexmax = float(16**15)  # md5 15-hex-digit prefix upper bound
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15), 16, 10).cast("double")
        + 1.0
    ) / (hexmax + 1.0)
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn(
            "sample_key", F.round(F.col(weight_col) + gumbel, 4)
        )
        .orderBy(F.desc("sample_key"), id_col)
        .limit(k)
    )
