"""Round-5 queries: windowed funnel within gap-sessions, dynamic-k
top-k join, HLL pre-join cardinality estimation, and the SQL macro
wrappers (jq_first / jq_values) end-to-end.

Registers into plans.queries.QUERIES/ORACLES on import (same pattern
as queries_r3 / queries_r4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# Windowed funnel WITHIN gap-sessions (session_funnel × funnel_windowed)
# ---------------------------------------------------------------------------


def q_session_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a CONVERSION WINDOW evaluated inside
    30-min-gap sessions: within each session, first view → click
    within 10 min of that view → purchase within 10 min of that
    click.  Sessionization is the lag()+running-sum two-window shape
    (ONE shuffle on user_id, AQE-skew-safe); the three dependent
    conditional mins then run per (user, session) where every
    aggregation and self-join keys on the session id derived from
    that same user partitioning — the big events frame is exchanged
    once for the windows and once for the (user, session) hash, and
    the two funnel-step joins reuse the latter co-partitioning.  At
    100 TB the skew knob is the user key (sessions per user are
    bounded by the gap rule, so (user, session) is strictly finer)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    win_us = 10 * 60 * 1_000_000
    keys = ["user_id", "session_seq"]
    s1 = sess.groupBy(*keys).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        sess.join(s1, keys)
        .groupBy(*keys)
        .agg(
            F.first("t_view").alias("t_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view"))
                    & (
                        F.unix_micros("ts") - F.unix_micros("t_view")
                        <= F.lit(win_us)
                    ),
                    F.col("ts"),
                )
            ).alias("t_click"),
        )
    )
    s3 = (
        sess.join(s2, keys)
        .groupBy(*keys)
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (
                        F.unix_micros("ts") - F.unix_micros("t_click")
                        <= F.lit(win_us)
                    ),
                    F.col("ts"),
                )
            ).alias("t_purchase"),
        )
    )
    return s3.agg(
        F.count("*").alias("n_sessions"),
        F.count("t_view").alias("step_view"),
        F.count("t_click").alias("step_click_10m"),
        F.count("t_purchase").alias("step_purchase_10m"),
    )


_ORACLE_SESSION_FUNNEL_WINDOWED = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked),
s1 AS (
  SELECT user_id, session_seq,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM sess GROUP BY 1, 2),
s2 AS (
  SELECT s.user_id, s.session_seq, any_value(p.t_view) AS t_view,
         min(CASE WHEN s.event_type = 'click' AND s.ts > p.t_view
                   AND s.ts <= p.t_view + INTERVAL 10 MINUTE
              THEN s.ts END) AS t_click
  FROM sess s JOIN s1 p USING (user_id, session_seq) GROUP BY 1, 2),
s3 AS (
  SELECT s.user_id, s.session_seq, any_value(p.t_view) AS t_view,
         any_value(p.t_click) AS t_click,
         min(CASE WHEN s.event_type = 'purchase' AND s.ts > p.t_click
                   AND s.ts <= p.t_click + INTERVAL 10 MINUTE
              THEN s.ts END) AS t_purchase
  FROM sess s JOIN s2 p USING (user_id, session_seq) GROUP BY 1, 2)
SELECT count(*) AS n_sessions,
       count(t_view) AS step_view,
       count(t_click) AS step_click_10m,
       count(t_purchase) AS step_purchase_10m
FROM s3
"""

QUERIES["session_funnel_windowed"] = q_session_funnel_windowed
ORACLES["session_funnel_windowed"] = _ORACLE_SESSION_FUNNEL_WINDOWED


# ---------------------------------------------------------------------------
# Per-key top-k join with DYNAMIC k
# ---------------------------------------------------------------------------


def q_topk_join_dynamic_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k orders per market segment where k VARIES per segment
    (k = 2 + length(segment) mod 3 — a stand-in for a per-key config
    dim).  The per-key k defeats Spark's WindowGroupLimit pushdown,
    so operators/topk.py ranks once and filters by the static upper
    bound (literal → pushdown fires, the exchange carries at most
    max_k rows per segment per map task) before the dynamic per-key
    trim runs on the already-tiny frame.  tests/test_plans.py asserts
    the WindowGroupLimit node survives."""
    from ..operators.topk import topk_per_key_dynamic

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .withColumn("k", F.lit(2) + F.length("c_mktsegment") % 3)
    )
    out = topk_per_key_dynamic(
        j,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        "k",
        max_k=4,
    )
    return out.select(
        "c_mktsegment", "k", "o_orderkey", "o_totalprice", "rk"
    ).orderBy("c_mktsegment", "rk")


_ORACLE_TOPK_DYNAMIC = """
SELECT c_mktsegment, k, o_orderkey, o_totalprice, rk
FROM (
  SELECT c.c_mktsegment, 2 + length(c.c_mktsegment) % 3 AS k,
         o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rk <= k ORDER BY c_mktsegment, rk
"""

QUERIES["topk_join_dynamic_k"] = q_topk_join_dynamic_k
ORACLES["topk_join_dynamic_k"] = _ORACLE_TOPK_DYNAMIC


# ---------------------------------------------------------------------------
# HLL pre-join cardinality estimation
# ---------------------------------------------------------------------------


def q_hll_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |orders ⋈ lineitem| per order priority WITHOUT
    executing the join (operators/joinest.py: one HLL+count pass per
    side, right stats broadcast as a single row), then VERIFY the
    estimate against the real join count.  The sketch estimate is
    engine-specific, so — like hll_distinct — the emitted columns are
    the deterministic exact values plus a bound check: the estimate
    must land within 15% of the true cardinality (TPC-H multiplicities
    are near-uniform; HLL rsd=0.02 adds ~2%).  The oracle is the
    exact+all-true table; the row fails if the estimator ever drifts
    out of bound."""
    from ..operators.joinest import join_cardinality_estimate

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    est = join_cardinality_estimate(
        orders,
        li,
        "o_orderkey",
        "l_orderkey",
        group_cols=["o_orderpriority"],
    )
    true = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("true_join_rows"))
    )
    ok = (
        F.abs(F.col("est_join_rows") - F.col("true_join_rows"))
        <= 0.15 * F.col("true_join_rows")
    )
    return (
        est.join(true, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_left",
            "n_right",
            "true_join_rows",
            ok.alias("est_ok"),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_HLL_JOINEST = """
WITH l AS (SELECT o_orderpriority, count(*) AS n_left
           FROM orders GROUP BY 1),
r AS (SELECT count(*) AS n_right FROM lineitem),
t AS (SELECT o.o_orderpriority, count(*) AS true_join_rows
      FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
      GROUP BY 1)
SELECT l.o_orderpriority, l.n_left, r.n_right, t.true_join_rows,
       TRUE AS est_ok
FROM l CROSS JOIN r JOIN t USING (o_orderpriority)
ORDER BY o_orderpriority
"""

QUERIES["hll_join_cardinality"] = q_hll_join_cardinality
ORACLES["hll_join_cardinality"] = _ORACLE_HLL_JOINEST


# ---------------------------------------------------------------------------
# SQL macro wrappers end-to-end (jq_first / jq_values)
# ---------------------------------------------------------------------------


def q_jq_first_values_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jq_first / jq_values SQL macros (udtf.py::register_macros)
    end-to-end: per-event docs {id, et, vals: [k, null, k+1]} are
    built with to_json, then jq_values fans out the NON-null stream
    elements (jq's `values` filter drops the embedded null) while
    jq_first takes the head of the same stream — both in one SQL
    statement, aggregated per event type.  Mirrors the reference's
    nested-program idiom (README.md:70) as named table functions."""
    from ..udtf import register_macros

    register_macros(spark)
    # scope: the two LATERALs each run the full Python-tier UDTF per
    # row; 20k rows exercises the macros end-to-end without making the
    # driver gate pay a double full-scan (the full-scan Python-tier
    # throughput number is jq_python_stress's job)
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 20000)
    k = F.get_json_object("props", "$.k").cast("bigint")
    docs = ev.select(
        "event_type",
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.array(k, F.lit(None).cast("bigint"), k + 1).alias("vals"),
            )
        ).alias("j"),
    )
    docs.createOrReplaceTempView("jq_macro_docs")
    return spark.sql(
        """
        SELECT d.event_type,
               count(v.col1) AS n_values,
               sum(v.col1) AS sum_values,
               sum(f.col1) AS sum_first
        FROM jq_macro_docs d,
        LATERAL jq_values(d.j, '.vals[]', 'bigint') v,
        LATERAL jq_first(d.j, '.vals[]', 'bigint') f
        GROUP BY d.event_type ORDER BY d.event_type
        """
    )


# each event contributes vals [k, null, k+1]: jq_values keeps k and
# k+1 (2 rows), jq_first keeps k (1 row, repeated across the 2-row
# values fanout → sum_first = 2k per event)
_ORACLE_JQ_MACROS = """
WITH k AS (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events WHERE event_id < 20000)
SELECT event_type,
       2 * count(*) AS n_values,
       CAST(sum(2 * k + 1) AS BIGINT) AS sum_values,
       CAST(sum(2 * k) AS BIGINT) AS sum_first
FROM k GROUP BY event_type ORDER BY event_type
"""

QUERIES["jq_first_values_sql"] = q_jq_first_values_sql
ORACLES["jq_first_values_sql"] = _ORACLE_JQ_MACROS


# ---------------------------------------------------------------------------
# Distributed k-means over the embeddings table
# ---------------------------------------------------------------------------


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three distributed Lloyd iterations over the embeddings table
    (operators/kmeans.py): assignment is pure codegen (k broadcast
    literal centroids, zip_with/aggregate squared-L2, first-min
    tie-break), the update shuffles only (cluster, dim) partial sums,
    and the driver syncs nothing but the k x d centroid matrix per
    iteration.  Deterministic end-to-end (smallest-id init, rounded
    centroids), so the oracle replays the identical three iterations
    as unrolled SQL (DuckDB list_distance / ordered row_number
    argmin).  Output: per-cluster population, mean label, and the
    first centroid coordinate."""
    from ..operators.kmeans import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = kmeans_fit(emb, k=8, iters=3)
    c0 = [c[0] for c in centroids]
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("label"), 4).alias("mean_label"),
        )
        .withColumn(
            "centroid_c0",
            F.element_at(F.lit(c0), F.col("cluster_id") + 1),
        )
        .orderBy("cluster_id")
    )


def _kmeans_oracle_iteration(i: int) -> str:
    """One unrolled Lloyd iteration: assign against c{i-1}, update to
    c{i} (empty clusters keep the previous centroid)."""
    return f"""
a{i} AS (SELECT vec_id, cid FROM (
   SELECT e.vec_id, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY list_distance(e.v, c.c), c.cid) AS rn
   FROM e CROSS JOIN c{i - 1} c) WHERE rn = 1),
m{i} AS (SELECT a.cid, u.pos, round(avg(u.val), 6) AS val
        FROM a{i} a JOIN e USING (vec_id),
             (SELECT e2.vec_id, unnest(e2.v) AS val,
                     generate_subscripts(e2.v, 1) AS pos
              FROM e e2) u
        WHERE u.vec_id = e.vec_id
        GROUP BY a.cid, u.pos),
n{i} AS (SELECT cid, list(val ORDER BY pos) AS c FROM m{i} GROUP BY cid),
c{i} AS (SELECT p.cid, coalesce(n.c, p.c) AS c
        FROM c{i - 1} p LEFT JOIN n{i} n USING (cid))"""


_ORACLE_KMEANS = (
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
       FROM e ORDER BY vec_id LIMIT 8),"""
    + ",".join(_kmeans_oracle_iteration(i) for i in (1, 2, 3))
    + """,
afinal AS (SELECT vec_id, cid FROM (
   SELECT e.vec_id, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY list_distance(e.v, c.c), c.cid) AS rn
   FROM e CROSS JOIN c3 c) WHERE rn = 1)
SELECT a.cid AS cluster_id, count(*) AS n_members,
       round(avg(e.label), 4) AS mean_label,
       any_value(c.c[1]) AS centroid_c0
FROM afinal a JOIN e USING (vec_id) JOIN c3 c ON c.cid = a.cid
GROUP BY a.cid ORDER BY cluster_id
"""
)

QUERIES["kmeans_embeddings"] = q_kmeans_embeddings
ORACLES["kmeans_embeddings"] = _ORACLE_KMEANS


# ---------------------------------------------------------------------------
# Exact duplicate n-gram span detection (substring-dedup signal)
# ---------------------------------------------------------------------------


def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-passage detection: which 8-token spans occur in
    MORE THAN ONE document (the substring-dedup signal of "exact
    substring deduplication" in LLM data curation — a span shared
    across documents is memorization fuel).  Shape: n-grams are built
    in pure codegen (sequence + slice + array_join), reduced to their
    64-bit xxhash BEFORE the exchange — the shuffle carries 8-byte
    keys, not ~100-byte token strings (~12× less shuffle volume at
    100 TB; a 2⁻⁶⁴-per-pair hash collision would only merge two gram
    identities, the same accepted trade-off as the connected-
    components convergence hash).  Shuffled ONCE on the gram hash;
    "appears in more than one doc" is min(doc)≠max(doc) — no
    COUNT(DISTINCT) expand — and the per-doc rollup's join reuses the
    gram-hash partitioning the aggregation just produced.

    The (doc, gram-hash) frame feeds BOTH the gram aggregation and
    the per-doc join; Catalyst does not ReusedExchange the two
    identical subtrees across the AQE stage boundary (verified on the
    executed plan), so without intervention the gram build + its
    exchange run twice.  Pre-partitioning on the gram hash and
    eagerly checkpointing materializes the build ONCE in the layout
    both consumers need (the pagerank/LPA edge-frame idiom):
    measured 4.2 s → 2.5 s at sf0.1."""
    n = 8
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = docs.select("doc_id", F.explode(grams).alias("gram"))
    g = g.repartition(F.col("gram")).localCheckpoint(eager=True)
    gram_docs = g.groupBy("gram").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup")
    )
    per_doc = (
        g.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias(
                "n_dup_grams"
            ),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6),
        )
    )
    return per_doc.orderBy(
        F.col("dup_ratio").desc(), "doc_id"
    ).limit(15)


_ORACLE_DUP_NGRAMS = """
WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
g AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram
      FROM toks, unnest(range(1, greatest(len(t) - 6, 1))) AS r(i)
      WHERE len(t) >= 8),
gd AS (SELECT gram, count(DISTINCT doc_id) AS n_docs_with_gram FROM g GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN gd.n_docs_with_gram > 1 THEN 1 ELSE 0 END) AS n_dup_grams
  FROM g JOIN gd USING (gram) GROUP BY g.doc_id)
SELECT doc_id, n_grams, CAST(n_dup_grams AS BIGINT) AS n_dup_grams,
       round(n_dup_grams * 1.0 / n_grams, 6) AS dup_ratio
FROM per_doc
ORDER BY dup_ratio DESC, doc_id LIMIT 15
"""

QUERIES["dup_ngram_spans"] = q_dup_ngram_spans
ORACLES["dup_ngram_spans"] = _ORACLE_DUP_NGRAMS


# ---------------------------------------------------------------------------
# Per-dimension embedding standardization (distributed feature scaling)
# ---------------------------------------------------------------------------


def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding column,
    computed distributively: dimension means/stds come from ONE
    posexplode aggregation (map-side-combined partial sums — never a
    vector collect), are broadcast back as a literal d-length pair of
    arrays, and the normalization itself is pure codegen zip_with.
    The verification output aggregates the standardized corpus per
    label: post-standardization dimension means must be ~0 and stds
    ~1 globally, so per-label deviations expose real structure.  The
    oracle replays the same two-pass arithmetic (population std, +1e-9
    guard) in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    # (r14 note: a lazy broadcast variant of this collect was measured
    # SLOWER — 0.57 → 0.93 s — the extra AQE broadcast stage costs more
    # than the eager O(d)-row job it replaces; kept eager on evidence.)
    stats = (
        emb.select(F.posexplode(vec).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.avg("val").alias("mu"),
            F.round(F.stddev_pop("val"), 9).alias("sigma"),
        )
        .orderBy("pos")
        .collect()
    )
    mu = [r["mu"] for r in stats]
    sigma = [r["sigma"] + 1e-9 for r in stats]
    z = F.zip_with(
        F.zip_with(vec, F.lit(mu), lambda x, m: x - m),
        F.lit(sigma),
        lambda x, s: x / s,
    )
    zsum = F.aggregate(z, F.lit(0.0), lambda acc, x: acc + x)
    return (
        emb.select("label", zsum.alias("zsum"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("zsum"), 4).alias("mean_zsum"),
        )
        .orderBy("label")
    )


_ORACLE_EMB_STD = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id, label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
stats AS (SELECT pos, avg(val) AS mu, round(stddev_pop(val), 9) + 1e-9 AS sigma
          FROM u GROUP BY pos),
z AS (SELECT u.vec_id, u.label, sum((u.val - s.mu) / s.sigma ORDER BY u.pos) AS zsum
      FROM u JOIN stats s USING (pos) GROUP BY u.vec_id, u.label)
SELECT label, count(*) AS n, round(avg(zsum), 4) AS mean_zsum
FROM z GROUP BY label ORDER BY label
"""

QUERIES["embedding_standardize"] = q_embedding_standardize
ORACLES["embedding_standardize"] = _ORACLE_EMB_STD


# ---------------------------------------------------------------------------
# One-pass table profiling (ANALYZE-style column statistics)
# ---------------------------------------------------------------------------


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profile of lineitem — the ANALYZE/
    data-profiling primitive: per column, row count, null count,
    exact distinct count (verified against the HLL estimate, the
    100 TB fixed-size-partials path), and min/max rendered as strings
    so heterogeneous columns share a schema.

    Shape note (measured at sf0.1, fresh-plan medians): N
    countDistinct's in ONE aggregate makes Catalyst EXPAND every row
    N+1 ways and aggregate the whole multiplied stream in a single
    task group — 43 s.  The r5–r10 shape (unpivot via stack, then
    countDistinct + approx_count_distinct over the long frame) fixed
    the expand but still paid (a) a 5× row materialization with
    every value CAST to string, and (b) Catalyst's distinct-rewrite
    expand — mixing a distinct agg (countDistinct) with a
    non-distinct one (approx_count_distinct) in the same aggregate
    doubles the stream again — 2.45 s.  The r11 shape removes both:

    * the HLL estimate moves into the wide basic pass (one
      approx_count_distinct per column is non-distinct → ordinary
      partial aggregation, fixed-size sketch per task, no expand);
    * exact ndv runs as one single-column countDistinct per column,
      UNIONed — each is the standard two-phase partial-distinct plan
      over the column's NATIVE type (no stack, no string cast; the
      casts used by min/max are injective for every profiled type,
      so ndv over the native value equals ndv over its string form —
      the oracle pins that).  The per-column jobs are independent
      stages of one action and schedule concurrently; scan cost is
      one column apiece (columnar pruning), so total I/O matches the
      old single 5-column pass.  Measured: 2.45 s → ~0.7 s.

    100 TB: per-column fan-out is bounded by profile WIDTH (not
    rows); each distinct is partial-deduped map-side before its
    exchange, HLL partials are constant-size, and the final join is
    width×width."""
    cols = [
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
        "l_extendedprice",
    ]
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    rsd = 0.02
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__andv"),
        ]
    wide = load_table(spark, sf_dir, "lineitem").agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__min, {c}__max, {c}__andv" for c in cols
    )
    basic = wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args})"
        " AS (column_name, n_nulls, min_s, max_s, andv)",
    )
    ndv_parts = [
        li.agg(F.countDistinct(c).alias("ndv")).select(
            F.lit(c).alias("column_name"), "ndv"
        )
        for c in cols
    ]
    ndv = ndv_parts[0]
    for p in ndv_parts[1:]:
        ndv = ndv.unionAll(p)
    return (
        basic.join(ndv, "column_name")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "ndv",
            (
                F.abs(F.col("andv") - F.col("ndv"))
                <= F.lit(5 * rsd) * F.col("ndv")
            ).alias("ndv_bound_ok"),
            "min_s",
            "max_s",
        )
        .orderBy("column_name")
    )


_ORACLE_PROFILE = """
WITH w AS (
  SELECT count(*) AS n_rows,
         sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS k_nulls,
         count(DISTINCT l_orderkey) AS k_ndv,
         CAST(min(l_orderkey) AS VARCHAR) AS k_min, CAST(max(l_orderkey) AS VARCHAR) AS k_max,
         sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS q_nulls,
         count(DISTINCT l_quantity) AS q_ndv,
         CAST(min(l_quantity) AS VARCHAR) AS q_min, CAST(max(l_quantity) AS VARCHAR) AS q_max,
         sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS r_nulls,
         count(DISTINCT l_returnflag) AS r_ndv,
         CAST(min(l_returnflag) AS VARCHAR) AS r_min, CAST(max(l_returnflag) AS VARCHAR) AS r_max,
         sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS s_nulls,
         count(DISTINCT l_shipdate) AS s_ndv,
         strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS s_min,
         strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS s_max,
         sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS e_nulls,
         count(DISTINCT l_extendedprice) AS e_ndv,
         CAST(min(l_extendedprice) AS VARCHAR) AS e_min, CAST(max(l_extendedprice) AS VARCHAR) AS e_max
  FROM lineitem)
SELECT * FROM (
  SELECT 'l_orderkey' AS column_name, n_rows, CAST(k_nulls AS BIGINT) AS n_nulls,
         k_ndv AS ndv, TRUE AS ndv_bound_ok, k_min AS min_s, k_max AS max_s FROM w
  UNION ALL
  SELECT 'l_quantity', n_rows, CAST(q_nulls AS BIGINT), q_ndv, TRUE, q_min, q_max FROM w
  UNION ALL
  SELECT 'l_returnflag', n_rows, CAST(r_nulls AS BIGINT), r_ndv, TRUE, r_min, r_max FROM w
  UNION ALL
  SELECT 'l_shipdate', n_rows, CAST(s_nulls AS BIGINT), s_ndv, TRUE, s_min, s_max FROM w
  UNION ALL
  SELECT 'l_extendedprice', n_rows, CAST(e_nulls AS BIGINT), e_ndv, TRUE, e_min, e_max FROM w)
ORDER BY column_name
"""

QUERIES["table_profile"] = q_table_profile
ORACLES["table_profile"] = _ORACLE_PROFILE


# ---------------------------------------------------------------------------
# Equi-depth histogram (distributed quantile binning)
# ---------------------------------------------------------------------------


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-depth histogram of l_extendedprice: bucket
    bounds from Spark's exact interpolating `percentile` (the same
    definition as DuckDB quantile_cont), then one scan counts rows
    per bucket via
    a codegen bucket-index expression (no second shuffle of data —
    bounds are a 1-row broadcast literal).  Equi-depth histograms are
    the optimizer/statistics primitive for selectivity estimation and
    the binning step for feature discretization at 100 TB (the scale
    path swaps the exact percentile for the t-digest/GK sketches this
    repo also ships; the binning scan is unchanged).  r14 (guide §5):
    the bounds used to be an eager collect re-embedded as literals;
    they now ride the same 1-row broadcast lazily, so the whole query
    is one action with no driver round-trip.  r15 (ADVICE r14 medium):
    the bounds array is carried THROUGH the bucket aggregation via
    first(_b) instead of a second broadcast join, so the exact-
    percentile subtree (a full-table scan) plans ONCE — the r14 shape
    planned it twice (no ReusedExchange across the two broadcast
    sights: 3 parquet scans, now 2)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n_buckets = 10
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = li.agg(
        F.expr(
            "percentile(l_extendedprice, array({}))".format(
                ",".join(str(q) for q in qs)
            )
        ).alias("_b")
    )
    # bucket i covers (bounds[i-1], bounds[i]]; first bucket (-inf, b0]
    idx = F.aggregate(
        "_b",
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col("l_extendedprice") > b, 1).otherwise(0),
    )
    return (
        li.join(F.broadcast(bounds))
        .select(idx.alias("bucket"), "_b")
        .groupBy("bucket")
        # _b is the SAME 1-row broadcast value on every row, so
        # first() is deterministic; carrying it here keeps the
        # percentile subtree out of the plan a second time
        .agg(F.count(F.lit(1)).alias("n"), F.first("_b").alias("_b"))
        .withColumn(
            "lo",
            F.when(
                F.col("bucket") == 0, F.lit(None).cast("double")
            ).otherwise(
                F.element_at(F.col("_b"), F.col("bucket").cast("int"))
            ),
        )
        .withColumn(
            "hi",
            F.when(
                F.col("bucket") == n_buckets - 1, F.lit(None).cast("double")
            ).otherwise(
                F.element_at(F.col("_b"), F.col("bucket").cast("int") + 1)
            ),
        )
        .drop("_b")
        .orderBy("bucket")
    )


# DuckDB quantile_cont matches Spark's exact percentile_approx
# (accuracy >= N) interpolation for the same data
_ORACLE_EQUIDEPTH = """
WITH b AS (
  SELECT quantile_cont(l_extendedprice,
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds
  FROM lineitem),
x AS (
  SELECT CAST(
           (CASE WHEN l_extendedprice > bounds[1] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[2] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[3] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[4] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[5] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[6] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[7] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[8] THEN 1 ELSE 0 END) +
           (CASE WHEN l_extendedprice > bounds[9] THEN 1 ELSE 0 END) AS INTEGER) AS bucket
  FROM lineitem CROSS JOIN b)
SELECT x.bucket, count(*) AS n,
       CASE WHEN x.bucket = 0 THEN NULL ELSE b.bounds[x.bucket] END AS lo,
       CASE WHEN x.bucket = 9 THEN NULL ELSE b.bounds[x.bucket + 1] END AS hi
FROM x CROSS JOIN b
GROUP BY x.bucket, b.bounds ORDER BY x.bucket
"""

QUERIES["equidepth_histogram"] = q_equidepth_histogram
ORACLES["equidepth_histogram"] = _ORACLE_EQUIDEPTH


# ---------------------------------------------------------------------------
# Event-transition mining (session path bigrams)
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order path mining: per-user event streams become
    (prev_type → type) transition bigrams via ONE window pass
    (lag over the user partition — the exchange the sessionization
    family already establishes), then a global transition matrix with
    per-source probabilities.  The two aggregations are map-side
    combinable and the transition space is |types|² — tiny however
    large the corpus, so the output never becomes the bottleneck."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = bi.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(totals), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


_ORACLE_TRANSITIONS = """
WITH bi AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events),
c AS (SELECT prev_type, next_type, count(*) AS n FROM bi
      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM c ORDER BY prev_type, next_type
"""

QUERIES["event_transitions"] = q_event_transitions
ORACLES["event_transitions"] = _ORACLE_TRANSITIONS


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive-pair mining)
# ---------------------------------------------------------------------------


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: for each anchor
    document, draw k=3 deterministic negatives with the offset trick
    — offset = 1 + (md5-hash(anchor, i) mod (N-1)), neg = (anchor +
    offset) mod N — which can NEVER return the anchor itself and
    needs no rejection loop.  The draw is the repo's portable md5
    idiom, so the oracle replays it bit-for-bit; the negative's
    metadata comes from one broadcast-joinable id lookup.  Output:
    per-language count of anchors whose negatives happen to share the
    anchor's language (the collision rate a curriculum would
    monitor).  Everything is codegen: hash, offset, modulo, one join
    keyed on the (uniform, unskewed) sampled id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # r14 (guide §5): the corpus count rides a 1-row broadcast instead
    # of an eager count() — one action, no driver round-trip.
    n_docs = docs.agg(F.count(F.lit(1)).alias("_nd"))
    k = 3
    anchors = docs.select(
        F.col("doc_id").alias("anchor_id"), F.col("lang").alias("anchor_lang")
    ).where(F.col("anchor_id") < 500)
    pairs = anchors.join(F.broadcast(n_docs)).select(
        "anchor_id",
        "anchor_lang",
        "_nd",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        "anchor_id",
        "anchor_lang",
        (
            (
                F.col("anchor_id")
                + 1
                + F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("anchor_id").cast("string"),
                                    F.col("i").cast("string"),
                                )
                            ),
                            1,
                            13,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                    F.col("_nd") - 1,
                )
            )
            % F.col("_nd")
        ).alias("neg_id"),
    )
    return (
        pairs.join(
            F.broadcast(
                docs.select(
                    F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
                )
            ),
            "neg_id",
        )
        .groupBy("anchor_lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("neg_lang") == F.col("anchor_lang"), 1).otherwise(0)
            ).alias("n_same_lang"),
        )
        .orderBy("anchor_lang")
    )


_ORACLE_NEGSAMPLE = """
WITH n AS (SELECT count(*) AS n_docs FROM documents),
anchors AS (SELECT doc_id AS anchor_id, lang AS anchor_lang FROM documents
            WHERE doc_id < 500),
pairs AS (
  SELECT a.anchor_id, a.anchor_lang,
         (a.anchor_id + 1 +
          (('0x' || substr(md5(a.anchor_id || ':' || i), 1, 13))::BIGINT
           % (n.n_docs - 1))) % n.n_docs AS neg_id
  FROM anchors a CROSS JOIN n, unnest([0, 1, 2]) AS t(i))
SELECT p.anchor_lang, count(*) AS n_pairs,
       CAST(sum(CASE WHEN d.lang = p.anchor_lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_lang
FROM pairs p JOIN documents d ON d.doc_id = p.neg_id
GROUP BY p.anchor_lang ORDER BY p.anchor_lang
"""

QUERIES["negative_sampling"] = q_negative_sampling
ORACLES["negative_sampling"] = _ORACLE_NEGSAMPLE


# ---------------------------------------------------------------------------
# Streaming windowed HLL distinct (mergeable sketch inside a stream agg)
# ---------------------------------------------------------------------------


def q_stream_hll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per hourly window computed INSIDE a
    streaming aggregation: COUNT(DISTINCT) is unsupported in
    Structured Streaming (it would need unbounded per-window state),
    but approx_count_distinct is a fixed-size mergeable HLL sketch —
    exactly why sketches are the streaming/100 TB answer for distinct
    counting.  Driven availableNow to completion (complete mode), then
    the sink's approx values are verified against a BATCH exact
    distinct per window (hll_distinct convention: the emitted columns
    are the deterministic exact values plus the bound flag; the row
    fails if the sketch ever blows |approx − exact| ≤ 5·rsd·exact)."""
    from ..sources.tables import stream_events
    from .queries import _STREAM_QUERY_SEQ, _stream_shuffle

    # rsd 0.05 (~2^9 registers): Spark's HLL++ aggregation buffer is
    # DENSE (no sparse mode), so per-window state is registers×8B —
    # rsd 0.01 cost 2^14 words per window (~94 MB of state across the
    # ~720 hourly windows, the dominant stream cost, measured 2.9 →
    # 2.0 s); the emitted columns carry the EXACT batch distinct plus
    # the bound flag, and the 5·rsd·exact + 2 allowance holds with
    # margin at every window and SF (checked by the 3-SF sweep —
    # a false bound_ok would hash-mismatch the oracle's TRUE column)
    rsd = 0.05
    raw = stream_events(spark, sf_dir)
    agg = (
        raw.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("win_start"), "n_events", "approx_users"
        )
    )
    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_hll_{_STREAM_QUERY_SEQ[0]}"
    with _stream_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish within 300s")
    sink = spark.table(name)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(F.col("window.start").alias("win_start"), "n_users")
    )
    ok = (
        F.abs(F.col("approx_users") - F.col("n_users"))
        <= F.lit(5 * rsd) * F.col("n_users") + F.lit(2)
    )
    return (
        sink.join(exact, "win_start")
        .select(
            F.unix_timestamp("win_start").alias("win_epoch"),
            "n_events",
            "n_users",
            ok.alias("bound_ok"),
        )
        .orderBy("win_epoch")
    )


_ORACLE_STREAM_HLL = """
SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS win_epoch,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       TRUE AS bound_ok
FROM events GROUP BY 1 ORDER BY win_epoch
"""

QUERIES["stream_hll_window"] = q_stream_hll_window
ORACLES["stream_hll_window"] = _ORACLE_STREAM_HLL


# ---------------------------------------------------------------------------
# Rolling anomaly detection (per-key trailing-window z-score)
# ---------------------------------------------------------------------------


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling anomaly flags: each event's value is scored
    against the mean/std of the PRECEDING 20 events for that user
    (strictly trailing frame — no leakage from the current row), and
    |z| > 3 flags it.  One window pass on the user partitioning (the
    same single exchange as the sessionization family); the rolling
    frame is O(20) state per row regardless of history length, which
    is what makes this the streaming-adjacent batch shape at 100 TB.
    Output: per-user anomaly counts over users with enough history."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    n_prev = F.count("value").over(w)
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    scored = ev.select(
        "user_id",
        "value",
        n_prev.alias("n_prev"),
        mu.alias("mu"),
        sd.alias("sd"),
    ).where((F.col("n_prev") >= 10) & (F.col("sd") > 0))
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.when(F.abs(z) > 3, 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.max(F.abs(z)), 4).alias("max_abs_z"),
        )
        .orderBy("user_id")
    )


_ORACLE_ROLLING_ANOMALY = """
WITH s AS (
  SELECT user_id, value,
         count(value) OVER w AS n_prev,
         avg(value) OVER w AS mu,
         stddev_samp(value) OVER w AS sd
  FROM events WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
f AS (SELECT user_id, (value - mu) / sd AS z FROM s
      WHERE n_prev >= 10 AND sd > 0)
SELECT user_id, count(*) AS n_scored,
       CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       round(max(abs(z)), 4) AS max_abs_z
FROM f GROUP BY user_id ORDER BY user_id
"""

QUERIES["rolling_anomaly"] = q_rolling_anomaly
ORACLES["rolling_anomaly"] = _ORACLE_ROLLING_ANOMALY


# ---------------------------------------------------------------------------
# Snapshot diff (keyed change classification between two table states)
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse snapshot diff: classify every order key across two
    table states (orders through 1997 vs through 1998, with every
    100th carried-over key given a simulated priority update in the
    new state) as ADDED / REMOVED / CHANGED / UNCHANGED via ONE full
    outer join on the key; change detection compares a codegen row
    fingerprint (xxhash64 of the tracked columns) instead of
    column-by-column predicates, so the compare cost doesn't grow
    with column count.  Both snapshot scans push their date filter to
    parquet.  Output: counts per change class (added/changed/unchanged
    appear in this append-only synthetic pair; removed is handled by
    the same classification)."""
    orders = load_table(spark, sf_dir, "orders")
    fp = lambda prio: F.xxhash64("o_orderstatus", "o_totalprice", prio)
    old = orders.where(F.year("o_orderdate") <= 1997).select(
        "o_orderkey", fp(F.col("o_orderpriority")).alias("fp_old")
    )
    drifted = F.when(
        F.col("o_orderkey") % 100 == 0, F.lit("9-RECLASSIFIED")
    ).otherwise(F.col("o_orderpriority"))
    new = orders.where(F.year("o_orderdate") <= 1998).select(
        "o_orderkey", fp(drifted).alias("fp_new")
    )
    j = old.join(new, "o_orderkey", "full_outer")
    cls = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("change_class"))
        .groupBy("change_class")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_class")
    )


_ORACLE_SNAPDIFF = """
WITH old AS (SELECT o_orderkey FROM orders WHERE year(o_orderdate) <= 1997),
new AS (SELECT o_orderkey, o_orderkey % 100 = 0 AS drifted
        FROM orders WHERE year(o_orderdate) <= 1998),
j AS (SELECT o.o_orderkey IS NULL AS is_added,
             n.o_orderkey IS NULL AS is_removed,
             coalesce(n.drifted, FALSE) AS is_changed
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
SELECT CASE WHEN is_added THEN 'added'
            WHEN is_removed THEN 'removed'
            WHEN is_changed THEN 'changed'
            ELSE 'unchanged' END AS change_class,
       count(*) AS n
FROM j GROUP BY 1 ORDER BY change_class
"""

QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLES["snapshot_diff"] = _ORACLE_SNAPDIFF


# ---------------------------------------------------------------------------
# REAL BMP decode path, value-gated end-to-end
# ---------------------------------------------------------------------------


def q_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real image-codec path under the driver gate: deterministic
    6×5 RGB BMPs are synthesized from each document's first 90 text
    bytes (zero-padded), ENCODED to actual BMP files (operators/
    codecs.py — header, bottom-up rows, BGR, stride padding), decoded
    back by the REAL decoder inside the Arrow mapInPandas feature
    stage, and reduced to per-channel means.  The oracle never sees a
    BMP: it recomputes the channel means straight from the text
    bytes, so any header/stride/channel-order bug in either codec
    direction shows up as a value mismatch.  (PNG got the same
    treatment in r10 — queries_r10.py::q_png_decode_stats; JPEG
    remains stubbed, a DCT codec needs libraries this container
    lacks.)"""
    import numpy as np

    from ..operators import codecs
    from ..operators.multimodal import MEDIA_SCHEMA, extract_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def synth(batches):
        for pdf in batches:
            rows = {"media_id": [], "modality": [], "content": [], "meta": []}
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")[:90]
                buf = np.zeros(90, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                bmp = codecs.encode_bmp(buf.reshape(6, 5, 3))
                rows["media_id"].append(mid)
                rows["modality"].append("image")
                rows["content"].append(bmp)
                rows["meta"].append(
                    {
                        "mime": "image/bmp",
                        "width": 5,
                        "height": 6,
                        "duration_ms": None,
                        "n_bytes": len(bmp),
                    }
                )
            import pandas as pd

            yield pd.DataFrame(rows)

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_features(media, dim=4, use_real_codecs=True)
    # FEATURE_SCHEMA carries float32; a float32 mean re-rounded to 6dp
    # can land on the wrong side of a rounding boundary.  The integer
    # channel SUM is exactly recoverable from the float32 mean
    # (relative error ~6e-8 x 7650 << 0.5), so the gate compares
    # integers — bit-exact across codec, schema, and oracle.
    def ch_sum(i: int):
        return F.round(
            F.element_at("feature", i).cast("double") * (30 * 255)
        ).cast("bigint")

    return feats.select(
        "media_id",
        "decode_ok",
        ch_sum(1).alias("sum_r"),
        ch_sum(2).alias("sum_g"),
        ch_sum(3).alias("sum_b"),
    ).orderBy("media_id")


# channel c = text byte positions p (1-based) with (p-1) % 3 == c,
# zero-padded to 90 bytes -> exact integer channel sums.  The Spark
# side truncates UTF-8 BYTES (encode()[:90]), so the oracle must too:
# bytes come from to_hex(encode(text)) (2 hex chars per byte), never
# from character-based substr/ord/length, which only agree on a
# pure-ASCII corpus (ADVICE r5).
_ORACLE_BMP_STATS = """
WITH base AS (SELECT doc_id, substr(to_hex(encode(text)), 1, 180) AS hx
              FROM documents WHERE doc_id < 200),
pos AS (SELECT doc_id, i,
               ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::INTEGER AS b
        FROM base, unnest(range(1, 91)) AS r(i)
        WHERE 2 * i <= length(hx)),
ch AS (SELECT doc_id, (i - 1) % 3 AS c, sum(b) AS s
       FROM pos GROUP BY 1, 2)
SELECT b.doc_id AS media_id, TRUE AS decode_ok,
       CAST(coalesce(max(CASE WHEN c = 0 THEN s END), 0) AS BIGINT) AS sum_r,
       CAST(coalesce(max(CASE WHEN c = 1 THEN s END), 0) AS BIGINT) AS sum_g,
       CAST(coalesce(max(CASE WHEN c = 2 THEN s END), 0) AS BIGINT) AS sum_b
FROM base b LEFT JOIN ch ON ch.doc_id = b.doc_id
GROUP BY b.doc_id ORDER BY media_id
"""

QUERIES["bmp_decode_stats"] = q_bmp_decode_stats
ORACLES["bmp_decode_stats"] = _ORACLE_BMP_STATS


# ---------------------------------------------------------------------------
# REAL WAV decode path, value-gated end-to-end
# ---------------------------------------------------------------------------


def q_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real audio-codec path under the driver gate: 32 deterministic
    int16 PCM samples are synthesized from each document's first 64
    text bytes (big-endian pairs, offset to signed), written to an
    actual RIFF/WAV file and read back through the REAL decoder
    (operators/codecs.py), then reduced to integer-exact signal
    metrics (sample sum, peak magnitude, sign-change count).  The
    oracle reconstructs the same integers straight from the text —
    any RIFF-chunk/endianness/PCM-layout bug in either direction is a
    value mismatch."""
    import numpy as np

    from ..operators import codecs

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    out_schema = (
        "doc_id long, n_samples int, sum_s long, peak_abs long, n_sign_changes long"
    )

    def roundtrip(batches):
        import pandas as pd

        for pdf in batches:
            rows = {
                "doc_id": [],
                "n_samples": [],
                "sum_s": [],
                "peak_abs": [],
                "n_sign_changes": [],
            }
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")[:64]
                buf = np.zeros(64, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                samples = (
                    buf[0::2].astype(np.int64) * 256 + buf[1::2].astype(np.int64)
                ) - 32768
                wav = codecs.encode_wav(samples.astype(np.int16), 16000)
                decoded, rate = codecs.decode_wav(wav)
                assert rate == 16000
                s = decoded.astype(np.int64)
                neg = s < 0
                rows["doc_id"].append(mid)
                rows["n_samples"].append(len(s))
                rows["sum_s"].append(int(s.sum()))
                rows["peak_abs"].append(int(np.abs(s).max()) if len(s) else 0)
                rows["n_sign_changes"].append(
                    int((neg[1:] != neg[:-1]).sum()) if len(s) > 1 else 0
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(roundtrip, schema=out_schema).orderBy("doc_id")


# sample i (0-based, 32 of them) = b(2i)*256 + b(2i+1) - 32768 with
# text zero-padded to 64 BYTES (UTF-8, via to_hex(encode()) — same
# byte-truncation rule as the Spark side, ASCII-independent); sign
# change counted on the s<0 flag
_ORACLE_WAV_STATS = """
WITH base AS (SELECT doc_id, substr(to_hex(encode(text)), 1, 128) AS hx
              FROM documents WHERE doc_id < 200),
bytes AS (SELECT doc_id, i,
                 CASE WHEN 2 * i <= length(hx)
                      THEN ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::INTEGER
                      ELSE 0 END AS b
          FROM base, unnest(range(1, 65)) AS r(i)),
samples AS (SELECT h.doc_id, (h.i - 1) / 2 AS si,
                   h.b * 256 + l.b - 32768 AS s
            FROM bytes h JOIN bytes l
              ON h.doc_id = l.doc_id AND l.i = h.i + 1
            WHERE h.i % 2 = 1),
flags AS (SELECT doc_id, si, s, s < 0 AS neg,
                 lag(s < 0) OVER (PARTITION BY doc_id ORDER BY si) AS prev_neg
          FROM samples)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_samples,
       CAST(sum(s) AS BIGINT) AS sum_s,
       CAST(max(abs(s)) AS BIGINT) AS peak_abs,
       CAST(sum(CASE WHEN prev_neg IS NOT NULL AND neg <> prev_neg
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sign_changes
FROM flags GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["wav_decode_stats"] = q_wav_decode_stats
ORACLES["wav_decode_stats"] = _ORACLE_WAV_STATS


# ---------------------------------------------------------------------------
# A/B experiment readout (Welch t-statistic per metric slice)
# ---------------------------------------------------------------------------


def q_ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis as ONE aggregation pass: users are hashed
    into arms (deterministic md5 parity — the repo's portable idiom),
    and per event-type slice the readout computes both arms' n/mean/
    variance, the lift, and Welch's t-statistic, entirely from
    map-side-combinable aggregates (sum, sumsq, count — never a
    per-arm self-join).  The t computation is closed-form over those
    sums, so the whole readout is codegen after a single shuffle on
    the slice key; at 100 TB this is the shape experimentation
    platforms need (one pass, mergeable partials, slices scale with
    |event_type| not |events|)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        % 2
    )
    x = ev.withColumn("arm", arm)
    agg = x.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("value"))).alias("s_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("value") * F.col("value"))).alias(
            "ss_a"
        ),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("value"))).alias("s_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("value") * F.col("value"))).alias(
            "ss_b"
        ),
    )
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    se = F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 4).alias("mean_a"),
        F.round(mean_b, 4).alias("mean_b"),
        F.round(mean_b - mean_a, 4).alias("lift"),
        F.round((mean_b - mean_a) / se, 4).alias("t_welch"),
    ).orderBy("event_type")


_ORACLE_AB = """
WITH x AS (
  SELECT event_type, value,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS arm
  FROM events),
agg AS (
  SELECT event_type,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN arm = 0 THEN value END) AS s_a,
         sum(CASE WHEN arm = 0 THEN value * value END) AS ss_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         sum(CASE WHEN arm = 1 THEN value END) AS s_b,
         sum(CASE WHEN arm = 1 THEN value * value END) AS ss_b
  FROM x GROUP BY event_type)
SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(s_a / n_a, 4) AS mean_a,
       round(s_b / n_b, 4) AS mean_b,
       round(s_b / n_b - s_a / n_a, 4) AS lift,
       round((s_b / n_b - s_a / n_a) /
             sqrt(((ss_a - s_a * s_a / n_a) / (n_a - 1)) / n_a
                  + ((ss_b - s_b * s_b / n_b) / (n_b - 1)) / n_b), 4) AS t_welch
FROM agg ORDER BY event_type
"""

QUERIES["ab_experiment_readout"] = q_ab_experiment_readout
ORACLES["ab_experiment_readout"] = _ORACLE_AB


# ---------------------------------------------------------------------------
# KMV sketch set operations (distinct INTERSECTION estimation)
# ---------------------------------------------------------------------------


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra from sketches: |users(view) ∩
    users(purchase)| and each side's cardinality estimated from KMV
    sketches (operators/kmv.py) — the set operation HLL cannot do —
    then VERIFIED against the exact intersection (hll_distinct
    convention: emitted columns are the deterministic exact values
    plus bound flags; the row fails if an estimate drifts).  Sketch
    build is one exchange per pass with WindowGroupLimit bounding the
    collect to s × k hashes; k=256 → rsd ≈ 1/√k ≈ 6%, bounds set at
    4σ (25%) for the intersection and 3σ (18%) for cardinalities."""
    from ..operators.kmv import kmv_distinct, kmv_intersection, kmv_sketches

    k = 256
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    sketches = kmv_sketches(ev, "event_type", "user_id", k=k)
    est_view = kmv_distinct(sketches.get("view", []), k)
    est_purch = kmv_distinct(sketches.get("purchase", []), k)
    est_inter = kmv_intersection(
        sketches.get("view", []), sketches.get("purchase", []), k
    )
    exact = ev.groupBy().agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_view"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_purchase"),
    )
    # r14 (guide §5): the exact-intersection count rides a 1-row
    # broadcast instead of an eager count() job (the SKETCH collect
    # above stays eager by design: the estimation arithmetic is the
    # operator's documented driver-side step over s x k bounded rows).
    inter_exact = (
        ev.where(F.col("event_type") == "view")
        .select("user_id")
        .intersect(
            ev.where(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    return exact.join(F.broadcast(inter_exact)).select(
        "n_view",
        "n_purchase",
        F.col("_nb").alias("n_both"),
        (
            F.abs(F.lit(est_view) - F.col("n_view")) <= 0.18 * F.col("n_view")
        ).alias("view_est_ok"),
        (
            F.abs(F.lit(est_purch) - F.col("n_purchase"))
            <= 0.18 * F.col("n_purchase")
        ).alias("purchase_est_ok"),
        (
            F.abs(F.lit(est_inter) - F.col("_nb"))
            <= 0.25 * F.col("_nb")
        ).alias("inter_est_ok"),
    )


_ORACLE_KMV = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM p) AS n_purchase,
       (SELECT count(*) FROM v JOIN p USING (user_id)) AS n_both,
       TRUE AS view_est_ok, TRUE AS purchase_est_ok, TRUE AS inter_est_ok
"""

QUERIES["kmv_set_ops"] = q_kmv_set_ops
ORACLES["kmv_set_ops"] = _ORACLE_KMV


# ---------------------------------------------------------------------------
# Point-in-time join of facts against SCD2 dimension versions
# ---------------------------------------------------------------------------


def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness for versioned dimensions: every
    purchase event is joined to the dimension STATE THAT WAS VALID at
    purchase time — the per-user SCD2 version stream built from the
    user's view events (scd2_history's interval logic).  The PIT
    lookup is the as-of shape, so it reuses operators/asof.py: ONE
    shuffle (union + user-keyed window), ZERO join nodes — the
    interval containment never becomes a range join.  The oracle uses
    DuckDB's native ASOF JOIN, verifying the same semantics from the
    definition."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    # collapse (user, ts) ties to one version (max value) so the as-of
    # pick is deterministic in BOTH engines — DuckDB's ASOF JOIN
    # resolves ties arbitrarily, Spark's union+window by payload order
    dim = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("state_value"))
    )
    probes = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(probes, dim, key="user_id", ts="ts", right_cols=["state_value"])
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("state_value_r").alias("n_with_state"),
            F.round(F.sum("state_value_r"), 4).alias("sum_state"),
        )
        .orderBy("user_id")
    )


_ORACLE_PIT = """
WITH dim AS (SELECT user_id, ts, round(max(value), 4) AS state_value
             FROM events WHERE event_type = 'view' AND user_id < 40
             GROUP BY user_id, ts),
probes AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase' AND user_id < 40),
j AS (SELECT p.user_id, d.state_value
      FROM probes p ASOF LEFT JOIN dim d
        ON p.user_id = d.user_id AND p.ts >= d.ts)
SELECT user_id, count(*) AS n_purchases,
       count(state_value) AS n_with_state,
       round(sum(state_value), 4) AS sum_state
FROM j GROUP BY user_id ORDER BY user_id
"""

QUERIES["scd2_pit_join"] = q_scd2_pit_join
ORACLES["scd2_pit_join"] = _ORACLE_PIT


# ---------------------------------------------------------------------------
# Compaction planning (bin-packing small files into target sizes)
# ---------------------------------------------------------------------------


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the table-maintenance primitive
    behind OPTIMIZE: per-(priority, month) "files" (row counts stand
    in for bytes) are packed into merge jobs by running-cumulative-sum
    binning (bin = floor(cumsum_before / target)), one window pass in
    layout order.  Sequential cumsum binning is the streaming-friendly
    packing discipline (no NP-hard bin packing, never reorders the
    layout, each job reads contiguous files).  Output: one row per
    planned merge job with file count and total size."""
    target = 4000
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.count(F.lit(1)).alias("size"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "o_orderpriority",
        "mon",
        "size",
        F.floor(
            F.coalesce(F.sum("size").over(w), F.lit(0)) / F.lit(target)
        ).alias("bin"),
    )
    return (
        planned.groupBy("o_orderpriority", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size").alias("total_size"),
            # string render: DuckDB's date_trunc yields DATE here while
            # Spark yields TIMESTAMP — pandas masks that (both become
            # Timestamp) but raw fetches don't; a 'yyyy-MM' string is
            # canonical under every comparator
            F.date_format(F.min("mon"), "yyyy-MM").alias("from_month"),
            F.date_format(F.max("mon"), "yyyy-MM").alias("to_month"),
        )
        .orderBy("o_orderpriority", "bin")
    )


_ORACLE_COMPACTION = """
WITH files AS (
  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mon,
         count(*) AS size
  FROM orders GROUP BY 1, 2),
planned AS (
  SELECT o_orderpriority, mon, size,
         CAST(floor(coalesce(sum(size) OVER (PARTITION BY o_orderpriority
                                             ORDER BY mon
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0)
                    / 4000) AS BIGINT) AS bin
  FROM files)
SELECT o_orderpriority, bin, count(*) AS n_files,
       CAST(sum(size) AS BIGINT) AS total_size,
       strftime(min(mon), '%Y-%m') AS from_month,
       strftime(max(mon), '%Y-%m') AS to_month
FROM planned GROUP BY 1, 2 ORDER BY o_orderpriority, bin
"""

QUERIES["compaction_plan"] = q_compaction_plan
ORACLES["compaction_plan"] = _ORACLE_COMPACTION


# ---------------------------------------------------------------------------
# Hilbert-curve locality layout (the Z-order upgrade)
# ---------------------------------------------------------------------------


def _hilbert_cols(x, y, order: int):
    """(x, y) in [0, 2^order)² → Hilbert distance d, as pure integer
    Catalyst expressions: the standard xy2d loop (rot + accumulate)
    unrolled ``order`` times.  Every step is CASE/AND/XOR arithmetic,
    so the identical unroll is expressible in SQL for the oracle."""
    d = F.lit(0).cast("long")
    for level in range(order - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + F.lit(s) * F.lit(s) * (F.lit(3) * rx).bitwiseXOR(ry)
        # rotate quadrant: when ry == 0 → mirror (if rx == 1) and swap
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - y).otherwise(y),
        ).otherwise(x)
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - x).otherwise(x),
        ).otherwise(y)
        x, y = nx, ny
    return d


def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering quality report — the locality upgrade
    over zorder_layout: the Hilbert curve has no Morton 'seams' (every
    consecutive pair of cells is adjacent), so per-file bounding boxes
    are tighter and data-skipping prunes more.  The xy2d computation
    is the standard rot-and-accumulate loop unrolled 4 levels (16×16
    grid) into pure integer CASE/XOR codegen — no UDF — and the
    oracle replays the identical unroll in SQL.  Output: per-file
    min/max of both dimensions plus each file's bounding-box area, the
    pruning-quality measure to compare against zorder_layout's.

    File assignment via ``global_ntile`` (operators/layout.py) — the
    range-partitioned two-phase ranking, not the SinglePartition
    global-sort window (plan-asserted in test_plans.py)."""
    from ..operators.layout import global_ntile

    order = 4
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 16).cast("long")
    y = (F.floor("value").cast("long") % 16).cast("long")
    hd = _hilbert_cols(x, y, order)
    hdf = ev.select("event_id", x.alias("x"), y.alias("y"), hd.alias("h"))
    return (
        global_ntile(hdf, ["h", "event_id"], 16)
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .withColumn(
            "bbox_area",
            (F.col("x_max") - F.col("x_min") + 1)
            * (F.col("y_max") - F.col("y_min") + 1),
        )
        .orderBy("file_id")
    )


def _hilbert_sql_unroll(order: int) -> tuple[str, str]:
    """The same xy2d unroll as staged SQL CTE columns; returns
    (joined CTE definitions, name of the last CTE)."""
    steps = []
    steps.append(
        "g0 AS (SELECT event_id, x, y, CAST(0 AS BIGINT) AS d, x AS cx, y AS cy FROM grid)"
    )
    for i, level in enumerate(range(order - 1, -1, -1), start=1):
        s = 1 << level
        steps.append(
            f"""g{i} AS (
  SELECT event_id, x, y,
         d + {s * s} * xor(3 * (CASE WHEN (cx & {s}) > 0 THEN 1 ELSE 0 END),
                           (CASE WHEN (cy & {s}) > 0 THEN 1 ELSE 0 END)) AS d,
         CASE WHEN (cy & {s}) > 0 THEN cx
              WHEN (cx & {s}) > 0 THEN {s - 1} - cy ELSE cy END AS cx,
         CASE WHEN (cy & {s}) > 0 THEN cy
              WHEN (cx & {s}) > 0 THEN {s - 1} - cx ELSE cx END AS cy
  FROM g{i - 1})"""
        )
    return ",\n".join(steps), f"g{order}"


_H_STEPS, _H_LAST = _hilbert_sql_unroll(4)

_ORACLE_HILBERT = f"""
WITH grid AS (
  SELECT event_id, user_id % 16 AS x,
         CAST(floor(value) AS BIGINT) % 16 AS y
  FROM events),
{_H_STEPS},
filed AS (SELECT x, y, ntile(16) OVER (ORDER BY d, event_id) AS file_id
          FROM {_H_LAST})
SELECT file_id, count(*) AS n, min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max,
       (max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS bbox_area
FROM filed GROUP BY file_id ORDER BY file_id
"""

QUERIES["hilbert_layout"] = q_hilbert_layout
ORACLES["hilbert_layout"] = _ORACLE_HILBERT


# ---------------------------------------------------------------------------
# Time-series densification (calendar-spine gap filling)
# ---------------------------------------------------------------------------


def q_timeseries_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free per-user daily series: a generated calendar spine
    (sequence + explode over the table's own [min, max] day range —
    no external table) cross-joined with the user dim, left-joined
    with the observed daily aggregates, missing days filled with
    zeros.  The spine is |users| × |days| rows built from literals
    (broadcast-sized), so the only real exchange is the daily
    aggregation of the fact table; gap filling itself never shuffles
    events.  Verification aggregates the densified series (total
    days, zero-filled days, value sum) per user.  r14 (guide §5): the
    [min, max] bounds ride the spine plan as a 1-row aggregate instead
    of an eager collect — one action, no driver round-trip."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 25)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("v"), F.count(F.lit(1)).alias("n"))
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(
        F.broadcast(
            bounds.select(
                F.explode(
                    F.sequence(
                        F.col("lo"),
                        F.col("hi"),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("day")
            )
        )
    )
    dense = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("v", F.lit(0.0)).alias("v"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    return (
        dense.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(F.col("n") == 0, 1).otherwise(0)).alias("n_gap_days"),
            F.round(F.sum("v"), 4).alias("total_v"),
        )
        .orderBy("user_id")
    )


_ORACLE_DENSIFY = """
WITH ev AS (SELECT * FROM events WHERE user_id < 25),
bounds AS (SELECT date_trunc('day', min(ts)) AS lo,
                  date_trunc('day', max(ts)) AS hi FROM ev),
spine AS (SELECT u.user_id, d.day
          FROM (SELECT DISTINCT user_id FROM ev) u
          CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
                      FROM bounds) d),
daily AS (SELECT user_id, date_trunc('day', ts) AS day,
                 round(sum(value), 4) AS v, count(*) AS n
          FROM ev GROUP BY 1, 2),
dense AS (SELECT s.user_id, s.day, coalesce(d.v, 0.0) AS v,
                 coalesce(d.n, 0) AS n
          FROM spine s LEFT JOIN daily d USING (user_id, day))
SELECT user_id, count(*) AS n_days,
       CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_days,
       round(sum(v), 4) AS total_v
FROM dense GROUP BY user_id ORDER BY user_id
"""

QUERIES["timeseries_densify"] = q_timeseries_densify
ORACLES["timeseries_densify"] = _ORACLE_DENSIFY


# ---------------------------------------------------------------------------
# TF-IDF top terms per language
# ---------------------------------------------------------------------------


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-characteristic terms: per language, the 5 tokens with
    the highest summed TF-IDF (tf = in-doc count, idf = ln((N+1)/
    (df+1)) — the smoothed convention).  Token explode shuffles once
    on (doc, token); document frequency reuses the token partitioning
    from the same exploded frame; the per-language top-5 is a
    WindowGroupLimit rank.  At 100 TB this is the inverted-index cost
    class — everything map-side combinable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # r14 (guide §5): the corpus count rides a 1-row broadcast instead
    # of an eager count() — one action, no driver round-trip; the
    # (n+1) cast to double reproduces the old float() literal exactly.
    n_docs = docs.agg(F.count(F.lit(1)).alias("_nd"))
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.col("_nd") + 1).cast("double") / (F.col("df") + 1)),
        )
        .groupBy("lang", "tok")
        .agg(F.round(F.sum("tfidf"), 6).alias("score"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("lang", "rk", "tok", "score")
        .orderBy("lang", "rk")
    )


_ORACLE_TFIDF = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents),
tf AS (SELECT doc_id, lang, tok, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT lang, tok,
         round(sum(tf * ln((n_docs + 1.0) / (df + 1))), 6) AS score
  FROM tf JOIN df USING (tok) CROSS JOIN n
  GROUP BY lang, tok, n_docs)
SELECT lang, rk, tok, score FROM (
  SELECT lang, tok, score,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score DESC, tok) AS rk
  FROM scored)
WHERE rk <= 5 ORDER BY lang, rk
"""

QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
ORACLES["tfidf_top_terms"] = _ORACLE_TFIDF


# ---------------------------------------------------------------------------
# Distribution drift monitoring (population stability index)
# ---------------------------------------------------------------------------


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two time slices — the
    standard production drift monitor: the metric distribution of the
    month's first half (reference) vs second half (current), binned
    into 10 fixed-width buckets, PSI = Σ (p−q)·ln(p/q) with +0.5
    Laplace smoothing per bin (the convention that keeps empty bins
    finite).  ONE scan computes both periods' histograms (conditional
    aggregation on a shared bin key — no self-join, no second pass);
    the PSI fold is a tiny 10-row aggregate.  Output: per-event-type
    PSI plus both sample sizes."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.dayofmonth("ts") <= 15).alias("is_ref"),
        F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int").alias("bin"),
    )
    hist = ev.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    totals = Window.partitionBy("event_type")
    n_bins = F.count(F.lit(1)).over(totals)  # bins actually present
    p = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(totals) + 0.5 * n_bins)
    q = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(totals) + 0.5 * n_bins)
    per_bin = hist.select(
        "event_type",
        "n_ref",
        "n_cur",
        ((p - q) * F.log(p / q)).alias("psi_term"),
    )
    return (
        per_bin.groupBy("event_type")
        .agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            F.round(F.sum("psi_term"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


# smoothing denominator = sum(n) + 0.5 x bins PRESENT (bins empty in
# BOTH periods are absent from the grouped frame) — both engines
# count present bins with a window count over the hist frame.
_ORACLE_PSI = """
WITH ev AS (
  SELECT event_type, value, day(ts) <= 15 AS is_ref,
         CAST(least(floor(value / 50), 9) AS INTEGER) AS bin
  FROM events),
hist AS (
  SELECT event_type, bin,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM ev GROUP BY 1, 2),
terms AS (
  SELECT event_type, n_ref, n_cur,
         ((n_ref + 0.5) / (sum(n_ref) OVER w + 0.5 * count(*) OVER w)
          - (n_cur + 0.5) / (sum(n_cur) OVER w + 0.5 * count(*) OVER w))
         * ln(((n_ref + 0.5) / (sum(n_ref) OVER w + 0.5 * count(*) OVER w))
              / ((n_cur + 0.5) / (sum(n_cur) OVER w + 0.5 * count(*) OVER w)))
           AS psi_term
  FROM hist
  WINDOW w AS (PARTITION BY event_type))
SELECT event_type, CAST(sum(n_ref) AS BIGINT) AS n_ref,
       CAST(sum(n_cur) AS BIGINT) AS n_cur,
       round(sum(psi_term), 6) AS psi
FROM terms GROUP BY event_type ORDER BY event_type
"""

QUERIES["psi_drift"] = q_psi_drift
ORACLES["psi_drift"] = _ORACLE_PSI


# ---------------------------------------------------------------------------
# Sort-merge-bucket join (zero-exchange co-located join)
# ---------------------------------------------------------------------------

_BUCKET_GATE_READY: dict[str, bool] = {}


def q_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB co-location strategy as a gated query: orders and
    lineitem are written ONCE as managed tables bucketed (and sorted)
    on the join key, and the revenue-per-priority join then plans as
    a sort-merge join with NO Exchange on either side — the shuffle
    was paid at ingest, amortized over every subsequent join on that
    key (tests/test_plans.py pins the exchange-free shape).  The
    bucketed write is cached per (process, sf_dir); re-running the
    query measures only the join."""
    import hashlib

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_orders = f"b_orders_gate_{sfx}"
    t_li = f"b_lineitem_gate_{sfx}"
    key = f"bucket_gate::{sf_dir}"
    from ..sources.jsonl import write_bucketed

    if not _BUCKET_GATE_READY.get(key):
        # a previous PROCESS may have left the managed-table location
        # behind (saveAsTable can't overwrite a directory the current
        # catalog doesn't know about) — drop both name and location
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        for t in (t_orders, t_li):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            if wh:
                shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderkey") < 30000
        )
        li = load_table(spark, sf_dir, "lineitem").where(
            F.col("l_orderkey") < 30000
        )
        write_bucketed(
            orders, t_orders, ["o_orderkey"], num_buckets=8,
            sort_by=["o_orderkey"],
        )
        write_bucketed(
            li, t_li, ["l_orderkey"], num_buckets=8,
            sort_by=["l_orderkey"],
        )
        _BUCKET_GATE_READY[key] = True
    o = spark.table(t_orders)
    l = spark.table(t_li)
    j = o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"])
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_BUCKETED = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey < 30000 AND l.l_orderkey < 30000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["bucketed_join_agg"] = q_bucketed_join_agg
ORACLES["bucketed_join_agg"] = _ORACLE_BUCKETED


# ---------------------------------------------------------------------------
# Streaming windowed top-k (heavy users per hour, rank over the sink)
# ---------------------------------------------------------------------------


def q_stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: per-hour (window, user) event counts
    aggregated IN-STREAM (watermarked, complete mode, availableNow),
    then the top-3 users per window ranked over the sink table —
    ranking is not allowed inside a streaming aggregation, so the
    stream maintains the mergeable counts and the cheap rank runs on
    the tiny materialized state (the lambda-architecture split that
    scales: stream state is O(windows × users-per-window), the rank
    is O(sink)).  Ties break on user_id; the oracle replays the same
    counts + rank in batch."""
    from ..sources.tables import stream_events
    from .queries import _STREAM_QUERY_SEQ, _stream_shuffle

    raw = stream_events(spark, sf_dir)
    agg = (
        raw.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "user_id", "n")
    )
    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_topk_{_STREAM_QUERY_SEQ[0]}"
    with _stream_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming query did not finish within 300s")
    sink = spark.table(name)
    w = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), F.col("user_id")
    )
    return (
        sink.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.unix_timestamp("win_start").alias("win_epoch"),
            "rk",
            "user_id",
            "n",
        )
        .orderBy("win_epoch", "rk")
    )


_ORACLE_STREAM_TOPK = """
WITH counts AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, user_id,
         count(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT win_start, user_id, n,
         row_number() OVER (PARTITION BY win_start
                            ORDER BY n DESC, user_id) AS rk
  FROM counts)
SELECT CAST(epoch(win_start) AS BIGINT) AS win_epoch, rk, user_id, n
FROM ranked WHERE rk <= 3 ORDER BY win_epoch, rk
"""

QUERIES["stream_topk_users"] = q_stream_topk_users
ORACLES["stream_topk_users"] = _ORACLE_STREAM_TOPK


# ---------------------------------------------------------------------------
# Quantile normalization across groups
# ---------------------------------------------------------------------------


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the value metric ACROSS event types —
    the batch-effect-correction transform: each value maps to the
    mean of the values holding the same within-group rank in every
    group, so all groups share one distribution afterwards.  Shape:
    one rank window per group (|group| exchanges collapse into one
    hash partition on event_type), then the rank-wise mean is a tiny
    aggregation joined back by rank.  Truncated to the common rank
    range so every rank has all groups represented (the standard
    equal-n convention).  Verification: per-group moments of the
    normalized metric must be IDENTICAL across groups — the defining
    property — so the output is per-type count/mean/min/max of the
    normalized values, rounded."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    # rank ties (equal values) may order arbitrarily, but equal values
    # produce identical (rank, value) multisets either way, so every
    # downstream aggregate is deterministic in both engines
    wr = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rk", F.row_number().over(wr))
    # r14 (guide §5): the common-length threshold rides a 1-row
    # broadcast instead of an eager collect — one action, no driver
    # round-trip (values unchanged: same min-of-group-maxes).
    n_common = (
        ranked.groupBy("event_type")
        .agg(F.max("rk").alias("n"))
        .agg(F.min("n").alias("_m"))
    )
    trunc = (
        ranked.join(F.broadcast(n_common))
        .where(F.col("rk") <= F.col("_m"))
        .drop("_m")
    )
    rank_means = trunc.groupBy("rk").agg(F.avg("value").alias("qn_value"))
    out = trunc.join(rank_means, "rk")
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("qn_value"), 4).alias("mean_qn"),
            F.round(F.min("qn_value"), 4).alias("min_qn"),
            F.round(F.max("qn_value"), 4).alias("max_qn"),
        )
        .orderBy("event_type")
    )


_ORACLE_QNORM = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk
  FROM events),
m AS (SELECT min(n) AS n_common FROM (
        SELECT event_type, max(rk) AS n FROM ranked GROUP BY 1)),
trunc AS (SELECT r.* FROM ranked r CROSS JOIN m WHERE r.rk <= m.n_common),
rank_means AS (SELECT rk, avg(value) AS qn_value FROM trunc GROUP BY rk)
SELECT t.event_type, count(*) AS n,
       round(avg(q.qn_value), 4) AS mean_qn,
       round(min(q.qn_value), 4) AS min_qn,
       round(max(q.qn_value), 4) AS max_qn
FROM trunc t JOIN rank_means q USING (rk)
GROUP BY t.event_type ORDER BY t.event_type
"""

QUERIES["quantile_normalize"] = q_quantile_normalize
ORACLES["quantile_normalize"] = _ORACLE_QNORM


# ---------------------------------------------------------------------------
# Unpivot (melt) surface
# ---------------------------------------------------------------------------


def q_melt_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via Spark's native unpivot (melt): three
    lineitem measures become (metric, value) rows — the reshape
    feeding per-metric aggregation/monitoring pipelines — then
    per-metric stats.  unpivot is a zero-shuffle projection (each row
    fans out to 3 in place); the only exchange is the final tiny
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    long = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("val"), 4).alias("mean_val"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("metric")
    )


_ORACLE_MELT = """
WITH long AS (
  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem)
SELECT metric, count(*) AS n, round(avg(val), 4) AS mean_val,
       round(min(val), 4) AS min_val, round(max(val), 4) AS max_val
FROM long GROUP BY metric ORDER BY metric
"""

QUERIES["melt_metrics"] = q_melt_metrics
ORACLES["melt_metrics"] = _ORACLE_MELT


# ---------------------------------------------------------------------------
# First-touch vs last-touch attribution in one window pass
# ---------------------------------------------------------------------------


def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution comparison: every purchase attributes its
    value to the FIRST and the LAST view within the preceding 24 h —
    both computed in ONE pass over a single user-keyed range window
    (range frame [-24 h, -1 s] over FLOORED epoch seconds — both
    engines must frame over the same integer grid or sub-second gaps
    diverge; conditional min/max inside the frame), no self-join, no
    asof machinery.  The
    output aggregates attributed revenue by whether each model found
    a touchpoint — the classic first/last-touch comparison report."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-86400, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", sec)
    marked = ev.select(
        "user_id",
        "event_type",
        "value",
        F.min(view_ts).over(w).alias("first_view_s"),
        F.max(view_ts).over(w).alias("last_view_s"),
    ).where(F.col("event_type") == "purchase")
    return marked.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("first_view_s").alias("n_attributed"),
        F.round(
            F.sum(F.when(F.col("first_view_s").isNotNull(), F.col("value"))), 4
        ).alias("attributed_value"),
        F.round(
            F.sum(
                F.when(
                    F.col("last_view_s") != F.col("first_view_s"), F.col("value")
                )
            ),
            4,
        ).alias("value_where_models_differ"),
    )


_ORACLE_ATTRIB = """
WITH e AS (
  SELECT user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
marked AS (
  SELECT user_id, event_type, value,
         min(CASE WHEN event_type = 'view' THEN sec END)
           OVER w AS first_view_s,
         max(CASE WHEN event_type = 'view' THEN sec END)
           OVER w AS last_view_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING))
SELECT count(*) AS n_purchases,
       count(first_view_s) AS n_attributed,
       round(sum(CASE WHEN first_view_s IS NOT NULL THEN value END), 4)
         AS attributed_value,
       round(sum(CASE WHEN last_view_s <> first_view_s THEN value END), 4)
         AS value_where_models_differ
FROM marked WHERE event_type = 'purchase'
"""

QUERIES["attribution_models"] = q_attribution_models
ORACLES["attribution_models"] = _ORACLE_ATTRIB


# ---------------------------------------------------------------------------
# Metric correlation matrix per group
# ---------------------------------------------------------------------------


def q_metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations between the lineitem measures per return
    flag — the feature-analysis primitive — computed with the
    built-in corr aggregate (one pass, map-side-combinable moment
    sums; never a self-join).  Rounded to 6 dp; both engines use the
    same sample-covariance definition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias(
                "corr_qty_disc"
            ),
            F.round(F.corr("l_extendedprice", "l_tax"), 6).alias(
                "corr_price_tax"
            ),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_CORR = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
       round(corr(l_extendedprice, l_tax), 6) AS corr_price_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

QUERIES["metric_correlations"] = q_metric_correlations
ORACLES["metric_correlations"] = _ORACLE_CORR


# ---------------------------------------------------------------------------
# Inter-event time distribution per event type
# ---------------------------------------------------------------------------


def q_interevent_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival statistics — the traffic-modeling
    primitive (rate estimation, burst detection): per-user consecutive
    gaps from ONE lag window on the user partitioning, then per-type
    mean/max and the exponential-fit rate 1/mean.  Gap computation
    reuses the sessionization family's single exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    gaps = ev.select(
        "event_type", (gap / 1e6).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
            F.round(F.lit(1.0) / F.avg("gap_s"), 8).alias("rate_per_s"),
        )
        .orderBy("event_type")
    )


_ORACLE_INTEREVENT = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts - lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id)) / 1e6 AS gap_s
  FROM events)
SELECT event_type, count(*) AS n_gaps,
       round(avg(gap_s), 4) AS mean_gap_s,
       round(max(gap_s), 4) AS max_gap_s,
       round(1.0 / avg(gap_s), 8) AS rate_per_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""

QUERIES["interevent_stats"] = q_interevent_stats
ORACLES["interevent_stats"] = _ORACLE_INTEREVENT


# ---------------------------------------------------------------------------
# Near-dup cluster size distribution
# ---------------------------------------------------------------------------


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape of the near-duplicate graph: connected components over
    the exact-hash duplicate pairs, rolled into a cluster-SIZE
    histogram (how many singletons / pairs / bigger families) — the
    summary a dedup run reports before deciding keep-policies.  The
    pair source here is exact-hash equality (deterministic), the
    components come from operators/dedup.py's label propagation, and
    the histogram is two tiny aggregations over the component
    labels."""
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h = docs.select("doc_id", F.sha2("text", 256).alias("hh"))
    a, b = h.alias("a"), h.alias("b")
    pairs = (
        a.join(b, "hh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    # r14 (guide §5): the singleton count used to be two eager driver
    # jobs (docs.count() + the clustered-row sum) rebuilt into a
    # literal row; it is now the same arithmetic over two 1-row
    # aggregates joined lazily — one action, no driver round-trips.
    n_docs = docs.agg(F.count(F.lit(1)).alias("_nd"))
    in_clusters = sizes.agg(F.coalesce(F.sum("sz"), F.lit(0)).alias("_nin"))
    one_row = n_docs.join(F.broadcast(in_clusters)).select(
        F.lit(1).alias("sz"),
        (F.col("_nd") - F.col("_nin")).alias("n_clusters"),
    )
    hist = (
        sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("n_clusters"))
    )
    return (
        hist.select(F.col("sz").cast("int"), F.col("n_clusters"))
        .unionByName(one_row)
        .groupBy("sz")
        .agg(F.sum("n_clusters").alias("n_clusters"))
        .orderBy("sz")
    )


_ORACLE_CLUSTER_SIZES = """
WITH h AS (SELECT doc_id, sha256(text) AS hh FROM documents),
comp AS (SELECT hh, count(*) AS sz FROM h GROUP BY hh)
SELECT CAST(sz AS INTEGER) AS sz,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM comp GROUP BY sz ORDER BY sz
"""

QUERIES["dedup_cluster_sizes"] = q_dedup_cluster_sizes
ORACLES["dedup_cluster_sizes"] = _ORACLE_CLUSTER_SIZES


# ---------------------------------------------------------------------------
# Chi-square independence test (event type × value band)
# ---------------------------------------------------------------------------


def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic between event type
    and the value band — the categorical-association primitive: the
    contingency table is ONE aggregation, the margins are two window
    sums over that tiny table, and chi² = Σ (o−e)²/e folds in place.
    Output: the statistic, degrees of freedom, and the table size."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(F.floor(F.col("value") / 100), F.lit(4)).cast("int").alias("band"),
    )
    ct = ev.groupBy("event_type", "band").agg(F.count(F.lit(1)).alias("o"))
    w_all = Window.partitionBy()
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("band")
    e = (
        F.sum("o").over(w_r)
        * F.sum("o").over(w_c)
        / F.sum("o").over(w_all)
    )
    terms = ct.select(
        "event_type",
        "band",
        "o",
        ((F.col("o") - e) * (F.col("o") - e) / e).alias("t"),
    )
    # r14 (guide §5): the two distinct counts used to be two eager
    # driver jobs; they are now ONE lazy aggregate riding a 1-row
    # broadcast into the final single-row result.
    dims = ev.agg(
        F.countDistinct("event_type").alias("_nt"),
        F.countDistinct("band").alias("_nb"),
    )
    return (
        terms.agg(
            F.round(F.sum("t"), 6).alias("chi2"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .join(F.broadcast(dims))
        .select(
            "chi2",
            ((F.col("_nt") - 1) * (F.col("_nb") - 1))
            .cast("int")
            .alias("dof"),
            "n_cells",
        )
    )


_ORACLE_CHISQ = """
WITH ev AS (
  SELECT event_type,
         CAST(least(floor(value / 100), 4) AS INTEGER) AS band
  FROM events),
ct AS (SELECT event_type, band, count(*) AS o FROM ev GROUP BY 1, 2),
terms AS (
  SELECT o,
         sum(o) OVER (PARTITION BY event_type) * sum(o) OVER (PARTITION BY band)
           * 1.0 / sum(o) OVER () AS e
  FROM ct)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       ((SELECT count(DISTINCT event_type) FROM ev) - 1)
         * ((SELECT count(DISTINCT band) FROM ev) - 1) AS dof,
       count(*) AS n_cells
FROM terms
"""

QUERIES["chisq_independence"] = q_chisq_independence
ORACLES["chisq_independence"] = _ORACLE_CHISQ


# ---------------------------------------------------------------------------
# Sequential pattern mining: top event trigrams
# ---------------------------------------------------------------------------


def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 sequential patterns: the 10 most frequent (a → b → c)
    event chains across users, from TWO lag windows on the same
    user partitioning (one exchange, one sort — the second lag reuses
    the frame), ranked with a global top-k.  The pattern space is
    |types|³ so the aggregation output stays tiny at any corpus
    size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("a"),
        F.lag("event_type", 1).over(w).alias("b"),
        F.col("event_type").alias("c"),
    ).where(F.col("a").isNotNull())
    return (
        tri.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "a", "b", "c")
        .limit(10)
    )


_ORACLE_TRIGRAMS = """
WITH tri AS (
  SELECT lag(event_type, 2) OVER w AS a,
         lag(event_type, 1) OVER w AS b,
         event_type AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT a, b, c, count(*) AS n FROM tri WHERE a IS NOT NULL
GROUP BY a, b, c ORDER BY n DESC, a, b, c LIMIT 10
"""

QUERIES["event_trigrams"] = q_event_trigrams
ORACLES["event_trigrams"] = _ORACLE_TRIGRAMS


# ---------------------------------------------------------------------------
# Nearest-event join (closest in time, either direction)
# ---------------------------------------------------------------------------


def q_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-in-time join: every purchase matched to its
    temporally CLOSEST view (before OR after) for the same user —
    the sensor-alignment generalization of the as-of join.  Shape:
    one union + user-keyed sort window computes the nearest
    PRECEDING view (backward as-of) and the nearest FOLLOWING view
    (forward as-of, the same window reversed) in a single exchange;
    the closer of the two wins (ties → the earlier view).  The
    oracle runs DuckDB's backward and forward ASOF joins and picks
    the closer side by the same rule."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 60)
    probes = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts")
    # union: tag probes/views, order by ts; last view ts ≤ probe, and
    # first view ts ≥ probe via the mirrored window
    u = probes.select(
        "user_id", "ts", F.lit(1).alias("tag"), F.col("event_id")
    ).unionByName(
        views.select(
            "user_id", "ts", F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    view_ts = F.when(F.col("tag") == 0, F.col("ts"))
    marked = u.select(
        "user_id",
        "ts",
        "tag",
        "event_id",
        F.max(view_ts).over(w_back).alias("prev_view"),
        F.min(view_ts).over(w_fwd).alias("next_view"),
    ).where(F.col("tag") == 1)
    d_prev = F.unix_micros("ts") - F.unix_micros("prev_view")
    d_next = F.unix_micros("next_view") - F.unix_micros("ts")
    nearest = F.when(
        F.col("prev_view").isNull(), F.col("next_view")
    ).when(
        F.col("next_view").isNull(), F.col("prev_view")
    ).when(d_prev <= d_next, F.col("prev_view")).otherwise(F.col("next_view"))
    out = marked.select(
        "user_id",
        "event_id",
        nearest.alias("nearest_view"),
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("nearest_view").alias("n_matched"),
            F.count_distinct("nearest_view").alias("n_distinct_views"),
        )
        .orderBy("user_id")
    )


_ORACLE_NEAREST = """
WITH ev AS (SELECT * FROM events WHERE user_id < 60),
probes AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase'),
views AS (SELECT user_id, ts AS vts FROM ev WHERE event_type = 'view'),
back AS (
  SELECT p.user_id, p.event_id, p.ts, v.vts AS prev_view
  FROM probes p ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND p.ts >= v.vts),
fwd AS (
  SELECT p.user_id, p.event_id, v.vts AS next_view
  FROM probes p ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND p.ts <= v.vts),
j AS (
  SELECT b.user_id, b.event_id,
         CASE WHEN b.prev_view IS NULL THEN f.next_view
              WHEN f.next_view IS NULL THEN b.prev_view
              WHEN epoch_us(b.ts - b.prev_view)
                   <= epoch_us(f.next_view - b.ts) THEN b.prev_view
              ELSE f.next_view END AS nearest_view
  FROM back b JOIN fwd f USING (user_id, event_id))
SELECT user_id, count(*) AS n_purchases,
       count(nearest_view) AS n_matched,
       count(DISTINCT nearest_view) AS n_distinct_views
FROM j GROUP BY user_id ORDER BY user_id
"""

QUERIES["nearest_event_join"] = q_nearest_event_join
ORACLES["nearest_event_join"] = _ORACLE_NEAREST


# ---------------------------------------------------------------------------
# Revenue concentration (Gini / Lorenz)
# ---------------------------------------------------------------------------


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration analysis of customer revenue — Gini coefficient
    and Lorenz points (share of revenue held by the bottom 50% / 90%
    of customers): per-customer totals (one exchange), a rank window
    over the totals, and the Gini folded from the classic
    rank-weighted sum  G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n  — no
    pairwise |xᵢ−xⱼ| join.  The window runs over CUSTOMERS (already
    aggregated), not order rows, so the sorted pass is tiny relative
    to the fact scan at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev", F.row_number().over(w).alias("i")
    )
    # r14 (guide §5): the (n, total) pair used to be an eager driver
    # round-trip rebuilt into literals; it now rides a 1-row broadcast
    # and the bottom-share thresholds are the same double-multiply +
    # truncating cast the Python int() performed — one action, no
    # driver round-trip, bit-identical values.
    n_total = ranked.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("rev").alias("_t")
    )
    shares = ranked.join(F.broadcast(n_total)).agg(
        F.max("_n").alias("_n"),
        F.max("_t").alias("_t"),
        F.round(
            F.sum(
                F.when(
                    F.col("i") <= F.expr("CAST(_n * 0.5 AS BIGINT)"),
                    F.col("rev"),
                )
            )
            / F.max("_t"),
            6,
        ).alias("bottom50_share"),
        F.round(
            F.sum(
                F.when(
                    F.col("i") <= F.expr("CAST(_n * 0.9 AS BIGINT)"),
                    F.col("rev"),
                )
            )
            / F.max("_t"),
            6,
        ).alias("bottom90_share"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("rev")))
            / (F.max("_n") * F.max("_t"))
            - (F.max("_n") + F.lit(1.0)) / F.max("_n"),
            6,
        ).alias("gini"),
    )
    return shares.select(
        F.col("_n").cast("int").alias("n_customers"),
        F.round(F.col("_t"), 2).alias("total_revenue"),
        "gini",
        "bottom50_share",
        "bottom90_share",
    )


_ORACLE_GINI = """
WITH per_cust AS (
  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1),
ranked AS (
  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i FROM per_cust),
s AS (SELECT count(*) AS n, sum(rev) AS total, sum(i * rev) AS iw FROM ranked)
SELECT CAST(s.n AS BIGINT) AS n_customers,
       round(s.total, 2) AS total_revenue,
       round(2.0 * s.iw / (s.n * s.total) - (s.n + 1.0) / s.n, 6) AS gini,
       round((SELECT sum(rev) FROM ranked, s WHERE i <= CAST(floor(s.n * 0.5) AS BIGINT))
             / s.total, 6) AS bottom50_share,
       round((SELECT sum(rev) FROM ranked, s WHERE i <= CAST(floor(s.n * 0.9) AS BIGINT))
             / s.total, 6) AS bottom90_share
FROM s
"""

QUERIES["revenue_concentration"] = q_revenue_concentration
ORACLES["revenue_concentration"] = _ORACLE_GINI
