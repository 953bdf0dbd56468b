"""Round-4 queries: Python-tier jq stress at full-scan scale.

Registers into plans.queries.QUERIES/ORACLES on import (same pattern
as queries_r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..udtf import jq_explode
from .queries import ORACLES, QUERIES


def q_jq_python_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python-tier jq throughput under the driver's own clock: a FULL
    events scan (100k rows at sf0.1) through a program the native
    compiler cannot express — variable binding, reduce over an array
    iterate, array construction with select, gsub and test regexes —
    forced onto the Python UDTF tier with ``native="never"``.

    Each event becomes a ~120-byte JSON doc {id, et, vals:[k..k+9]};
    the program folds vals, counts multiples of 3, strips vowels from
    the event type, and regex-tests it, so per-row work is dominated
    by real jq evaluation (parse → 5-construct pipeline → marshal),
    not by Spark overhead.  Results aggregate per (c, t) so the
    correctness gate compares a small frame while every row's outputs
    flow into sums/min/max (any per-row wrong answer shifts a sum).

    Reference parity: this is the README.md:121 LATERAL VIEW shape at
    scale with a Tier-B program (SURVEY §2.2 J8/J21/J22/J24)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    doc = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("et"),
                F.sequence(k, k + 9).alias("vals"),
            )
        ).alias("doc")
    )
    program = (
        ". as $d"
        ' | ($d.et | gsub("[aeiou]"; "")) as $c'
        " | {id: $d.id, c: $c,"
        "    s: (reduce $d.vals[] as $v (0; . + $v)),"
        "    m: ([$d.vals[] | select(. % 3 == 0)] | length),"
        '    t: ($d.et | test("ck$"))}'
    )
    x = jq_explode(
        doc,
        "doc",
        program,
        "id:bigint",
        "c:string",
        "s:bigint",
        "m:int",
        "t:boolean",
        native="never",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return (
        x.groupBy("c", "t")
        .agg(
            F.count("*").alias("n"),
            F.sum("s").alias("sum_s"),
            F.sum("m").alias("sum_m"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("c", "t")
    )


_ORACLE_JQ_PY_STRESS = """
WITH e AS (
  SELECT event_id AS id,
         regexp_replace(event_type, '[aeiou]', '', 'g') AS c,
         regexp_matches(event_type, 'ck$') AS t,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events),
r AS (
  SELECT id, c, t,
         10 * k + 45 AS s,
         len(list_filter(range(k, k + 10), x -> x % 3 = 0)) AS m
  FROM e)
SELECT c, t, count(*) AS n, CAST(sum(s) AS BIGINT) AS sum_s,
       CAST(sum(m) AS BIGINT) AS sum_m,
       min(id) AS min_id, max(id) AS max_id
FROM r GROUP BY c, t ORDER BY c, t
"""

QUERIES["jq_python_stress"] = q_jq_python_stress
ORACLES["jq_python_stress"] = _ORACLE_JQ_PY_STRESS


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the documents corpus with
    per-token error-bound verification (operators/sketch.py).  The
    sketch build shuffles at most depth × width counter cells per map
    partition — bounded memory regardless of corpus size — and the
    probe reads it via a broadcast join.  Hashes are the repo's
    deterministic md5-bucket idiom, so the oracle rebuilds the SAME
    sketch in SQL and every estimate (and bound flag) matches
    exactly."""
    from ..operators.sketch import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, k=20, depth=4, width=1024)


_ORACLE_CMS = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents),
total AS (SELECT count(*) AS n_tokens FROM toks),
lv AS (SELECT tok, j FROM toks CROSS JOIN UNNEST(range(4)) AS t(j)),
sk AS (
  SELECT j,
         ('0x' || substr(md5(j::VARCHAR || '|' || tok), 1, 15))::BIGINT % 1024
           AS bucket,
         count(*) AS cnt
  FROM lv GROUP BY 1, 2),
exact AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY 1),
probe AS (
  SELECT e.tok, e.true_cnt, min(s.cnt) AS est_cnt
  FROM exact e CROSS JOIN UNNEST(range(4)) AS t(j)
  JOIN sk s
    ON s.j = t.j
   AND s.bucket = ('0x' || substr(md5(t.j::VARCHAR || '|' || e.tok), 1, 15))::BIGINT % 1024
  GROUP BY 1, 2)
SELECT tok AS token, true_cnt, est_cnt,
       est_cnt - true_cnt AS overest,
       (est_cnt - true_cnt) <= 2.718281828459045 / 1024 * n_tokens AS within_bound
FROM probe CROSS JOIN total
ORDER BY est_cnt DESC, token LIMIT 20
"""

QUERIES["cms_heavy_hitters"] = q_cms_heavy_hitters
ORACLES["cms_heavy_hitters"] = _ORACLE_CMS


def _staged_half_events(sf_dir: str) -> str:
    """events.parquet split into two half files (row-sliced with
    pyarrow, original encoding preserved) — a deterministic
    two-micro-batch source for incremental-maintenance streams.
    Reused per process via queries_r3._staged_dir."""
    import os

    import pyarrow.parquet as pq

    from .queries_r3 import _staged_dir

    def _build(d: str) -> None:
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        half = t.num_rows // 2
        pq.write_table(t.slice(0, half), os.path.join(d, "a.parquet"))
        pq.write_table(t.slice(half), os.path.join(d, "b.parquet"))

    return _staged_dir("half_events", sf_dir, _build)


def q_stream_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view via foreachBatch MERGE — the
    production pattern for maintaining an aggregate table from a
    stream without reprocessing history.  The events corpus is staged
    as two half files (one micro-batch each, maxFilesPerTrigger=1);
    every micro-batch aggregates ONLY its own rows and merges the
    partial (additive union + re-aggregate, written to a versioned dir
    and atomically swapped) into the per-event-type MV.  The final MV
    must equal the batch aggregate over all events — the oracle.

    At 100 TB the merge step is a keyed upsert into a transactional
    table format (Delta/Iceberg MERGE); the union + groupBy here is
    the same additive-merge semantics expressed against plain parquet,
    and each increment's cost scales with the BATCH, not the history.
    """
    import os
    import shutil
    import tempfile

    from ..sources.tables import stream_events
    from .queries import (_STREAM_QUERY_SEQ, _stream_checkpoint_root,
                          _stream_shuffle)

    d = _staged_half_events(sf_dir)
    mv_root = tempfile.mkdtemp(prefix="mv_store_")
    ckpt = tempfile.mkdtemp(prefix="mv_ckpt_", dir=_stream_checkpoint_root())
    mv_cur = os.path.join(mv_root, "current")
    mv_schema = "event_type string, n bigint, total_value double"

    def merge_batch(batch_df, batch_id: int) -> None:
        part = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("total_value")
        )
        if os.path.exists(mv_cur):
            old = spark.read.schema(mv_schema).parquet(mv_cur)
            part = (
                old.unionByName(part)
                .groupBy("event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        nxt = os.path.join(mv_root, f"v{batch_id}")
        part.write.mode("overwrite").parquet(nxt)
        prev = mv_cur + ".old"
        if os.path.exists(mv_cur):
            os.rename(mv_cur, prev)
        os.rename(nxt, mv_cur)
        shutil.rmtree(prev, ignore_errors=True)

    raw = stream_events(
        spark, d, glob=None, reader_options={"maxFilesPerTrigger": "1"}
    )
    _STREAM_QUERY_SEQ[0] += 1
    try:
        with _stream_shuffle(spark):
            q = (
                raw.select("event_type", "value")
                .writeStream.foreachBatch(merge_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("streaming query did not finish within 300s")
        out = spark.createDataFrame(
            spark.read.schema(mv_schema)
            .parquet(mv_cur)
            .select(
                "event_type", "n", F.round("total_value", 4).alias("total_value")
            )
            .collect(),
            "event_type string, n bigint, total_value double",
        )
    finally:
        shutil.rmtree(mv_root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out.orderBy("event_type")


_ORACLE_STREAM_MV = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_incremental_mv"] = q_stream_incremental_mv
ORACLES["stream_incremental_mv"] = _ORACLE_STREAM_MV


# ---------------------------------------------------------------------------
# t-digest percentile sketch (mergeable; bound-verified)
# ---------------------------------------------------------------------------


def q_tdigest_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest percentiles per l_returnflag — the third
    point on the quantile cost/accuracy curve next to `percentiles`
    (exact, unscalable sort) and `approx_percentiles` (GK sketch).
    Raw values NEVER shuffle: mapInPandas builds one ≤2δ-centroid
    digest per partition-group, the shuffle carries only those digest
    rows, applyInPandas merges and interpolates (operators/tdigest.py).

    Sketch estimates are partition-layout-dependent, so the query
    emits VERIFIED bounds, not raw estimates (the approx_percentiles
    pattern, queries.py:1655): a second pass computes each estimate's
    exact rank and checks |rank − q| ≤ 0.01 + 2/n, plus a mass check
    that the digest saw exactly n rows.  Oracle = deterministic
    all-true table; any accuracy/mass violation flips a boolean."""
    from ..operators.tdigest import tdigest_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.9, 0.99]
    est = tdigest_quantiles(
        li, "l_returnflag", "l_extendedprice", qs, delta=200.0
    ).withColumnRenamed("group", "grp")
    vals = li.select(
        F.col("l_returnflag").alias("grp"), "l_extendedprice"
    )
    ranks = (
        vals.join(F.broadcast(est), "grp")
        .groupBy("grp", "q")
        .agg(
            (
                F.sum((F.col("l_extendedprice") <= F.col("est")).cast("long"))
                / F.count("*")
            ).alias("rank"),
            F.count("*").alias("n"),
            F.first("n").alias("n_digest"),
        )
    )
    tol = F.lit(0.01) + F.lit(2.0) / F.col("n")
    return ranks.select(
        "grp",
        "q",
        "n",
        (F.abs(F.col("rank") - F.col("q")) <= tol).alias("within_bound"),
        (F.col("n_digest") == F.col("n")).alias("mass_ok"),
    ).orderBy("grp", "q")


_ORACLE_TDIGEST = """
SELECT l_returnflag AS grp, CAST(q AS DOUBLE) AS q, count(*) AS n,
       true AS within_bound, true AS mass_ok
FROM lineitem
CROSS JOIN (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q)
GROUP BY 1, 2 ORDER BY grp, q
"""

QUERIES["tdigest_percentiles"] = q_tdigest_percentiles
ORACLES["tdigest_percentiles"] = _ORACLE_TDIGEST


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-ES key: key_i = u_i^(1/w_i), take the k largest.  This
    is the one-pass, merge-friendly shape for 100 TB mixture sampling
    (distinct from stratified_sample's Bernoulli rates and from
    importance_resample's Gumbel top-k over logits): Spark's
    `ORDER BY key DESC LIMIT k` compiles to TakeOrderedAndProject —
    per-partition partial top-k, only k rows per partition reach the
    driver-side merge, no global sort shuffle.

    u is the repo's deterministic md5 idiom (so the oracle replays the
    exact same draw), compared in log space (ln u)/w — monotone in
    u^(1/w), numerically safer, and identical on both engines.  Weight
    = token count: longer documents proportionally likelier."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("double")
            + F.lit(0.5)
        )
        / F.lit(float(16**13))
    )
    w = F.greatest(F.size(F.split(F.trim("text"), r"\s+")), F.lit(1))
    keyed = docs.select(
        "doc_id",
        w.alias("weight"),
        (F.log(u) / w).alias("key"),
    )
    return (
        keyed.orderBy(F.col("key").desc(), "doc_id")
        .limit(64)
        .select("doc_id", "weight")
    )


_ORACLE_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')), 1) AS weight,
         ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 0.5)
            / pow(16.0, 13))
           / greatest(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> '')), 1) AS key
  FROM documents)
SELECT doc_id, weight FROM keyed ORDER BY key DESC, doc_id LIMIT 64
"""

QUERIES["weighted_sample"] = q_weighted_sample
ORACLES["weighted_sample"] = _ORACLE_WEIGHTED_SAMPLE


# ---------------------------------------------------------------------------
# Conversion-window funnel (view → click → purchase, bounded gaps)
# ---------------------------------------------------------------------------


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a CONVERSION WINDOW: view → click →
    purchase where each step lands within 30 minutes of the previous
    step's first completion.  Unlike funnel_conversion (any-order-in-
    time) this chains the deadline sequentially, so it needs three
    dependent conditional mins — expressed as one groupBy per step on
    the SAME user_id key: the first aggregation shuffles once and the
    two follow-up joins + re-aggregations reuse that hash partitioning
    (co-partitioned, no new exchange of the big side)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    win_us = 30 * 60 * 1_000_000
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    t2 = (
        ev.join(t1, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))
                    & (
                        F.unix_micros("ts") - F.unix_micros("t1")
                        <= F.lit(win_us)
                    ),
                    F.col("ts"),
                )
            ).alias("t2"),
        )
    )
    t3 = (
        ev.join(t2, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.first("t2").alias("t2"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))
                    & (
                        F.unix_micros("ts") - F.unix_micros("t2")
                        <= F.lit(win_us)
                    ),
                    F.col("ts"),
                )
            ).alias("t3"),
        )
    )
    return t3.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("step_view"),
        F.count("t2").alias("step_click_30m"),
        F.count("t3").alias("step_purchase_30m"),
    )


_ORACLE_FUNNEL_WINDOWED = """
WITH t1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY 1),
t2 AS (
  SELECT e.user_id, any_value(t1.t1) AS t1,
         min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t1
                   AND e.ts <= t1.t1 + INTERVAL 30 MINUTE
              THEN e.ts END) AS t2
  FROM events e JOIN t1 USING (user_id) GROUP BY 1),
t3 AS (
  SELECT e.user_id, any_value(t2.t1) AS t1, any_value(t2.t2) AS t2,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t2
                   AND e.ts <= t2.t2 + INTERVAL 30 MINUTE
              THEN e.ts END) AS t3
  FROM events e JOIN t2 USING (user_id) GROUP BY 1)
SELECT count(*) AS n_users, count(t1) AS step_view,
       count(t2) AS step_click_30m, count(t3) AS step_purchase_30m
FROM t3
"""

QUERIES["funnel_windowed"] = q_funnel_windowed
ORACLES["funnel_windowed"] = _ORACLE_FUNNEL_WINDOWED


# ---------------------------------------------------------------------------
# Top-k join (per-key limit pushed into the shuffle: WindowGroupLimit)
# ---------------------------------------------------------------------------


def q_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment by price: broadcast-join the
    customer dim onto orders, then rank within segment.  The
    row_number ≤ 3 predicate is pushed INTO the shuffle by Spark's
    WindowGroupLimit rule (verified in tests/test_plans.py): each map
    task forwards at most k rows per segment, so the exchange carries
    O(partitions × segments × k) rows instead of the full fact table —
    the difference between a top-k and a global sort at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    from pyspark.sql import Window

    j = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        j.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


_ORACLE_TOPK_JOIN = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rk
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rk <= 3 ORDER BY c_mktsegment, rk
"""

QUERIES["topk_join"] = q_topk_join
ORACLES["topk_join"] = _ORACLE_TOPK_JOIN


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the part co-occurrence graph (parts linked when
    they appear in the same order).  Degree-ordered orientation caps
    the wedge join at sum(outdeg²) ≤ m·√m — the skew-killer that
    makes the count feasible when a hub part appears in millions of
    orders (operators/graph.py).  The oracle counts the same
    id-normalized triangles with a 3-way join (semantics, not
    strategy)."""
    from ..operators.graph import triangle_count

    # one ship-year of co-occurrences: the filter pushes to the scan
    # and bounds the wedge set (the full-history graph is ~50× denser
    # — wedge volume grows with sum(outdeg²), so scoping the graph is
    # the knob, not the algorithm)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    return triangle_count(edges)


_ORACLE_TRIANGLES = """
WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            WHERE year(l_shipdate) = 1995),
e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
       FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
nodes AS (SELECT u FROM e0 UNION SELECT v FROM e0)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       (SELECT count(*) FROM e0) AS n_edges,
       (SELECT count(*) FROM e0 e1
        JOIN e0 e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e0 e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
"""

QUERIES["triangle_count"] = q_triangle_count
ORACLES["triangle_count"] = _ORACLE_TRIANGLES


# ---------------------------------------------------------------------------
# Exact-k stratified sample (deterministic, group-limit pushdown)
# ---------------------------------------------------------------------------


def q_stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k rows per stratum (vs stratified_sample's Bernoulli
    rates, which only hit k in expectation): rank by the
    deterministic md5 draw within each market segment, keep k=5.
    row_number ≤ k plans as WindowGroupLimit — each map task forwards
    at most k rows per stratum into the shuffle, so the exchange is
    O(tasks × strata × k) regardless of table size."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    return (
        cust.select(
            "c_mktsegment", "c_custkey", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= 5)
        .orderBy("c_mktsegment", "rk")
    )


_ORACLE_STRAT_TOPK = """
SELECT c_mktsegment, c_custkey, rk
FROM (
  SELECT c_mktsegment, c_custkey,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(c_custkey::VARCHAR), c_custkey) AS rk
  FROM customer)
WHERE rk <= 5 ORDER BY c_mktsegment, rk
"""

QUERIES["stratified_topk_sample"] = q_stratified_topk_sample
ORACLES["stratified_topk_sample"] = _ORACLE_STRAT_TOPK


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup: cluster-then-prune within centroid cells)
# ---------------------------------------------------------------------------


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings corpus: 8 deterministic centroid
    cells (first 8 corpus vectors, the ann_ivf_topk convention), drop
    the higher id of every within-cell pair with cosine ≥ 0.4
    (operators/similarity.py::semantic_dedup).  The quadratic step is
    confined to one cell — the property that keeps embedding dedup
    tractable at 100 TB — and the oracle replays assignment + pruning
    decision for decision."""
    import numpy as np

    from ..operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=np.float64)
    out = semantic_dedup(emb, centroids, threshold=0.4)
    return (
        out.groupBy("cell")
        .agg(
            F.count("*").alias("n_survivors"),
            F.min("vec_id").alias("min_id"),
            F.max("vec_id").alias("max_id"),
            F.sum("vec_id").alias("id_sum"),
        )
        .orderBy("cell")
    )


def _gen_semantic_dedup_oracle(
    n_cells: int = 8, threshold: float = 0.4, dim: int = 64
) -> str:
    d2 = " + ".join(
        f"(e.embedding[{i+1}]::DOUBLE - c.cv[{i+1}]::DOUBLE) * (e.embedding[{i+1}]::DOUBLE - c.cv[{i+1}]::DOUBLE)"
        for i in range(dim)
    )
    norm = (
        "sqrt("
        + " + ".join(
            f"embedding[{i+1}]::DOUBLE * embedding[{i+1}]::DOUBLE" for i in range(dim)
        )
        + ")"
    )
    pair_dot = " + ".join(
        f"an.embedding[{i+1}]::DOUBLE * bn.embedding[{i+1}]::DOUBLE" for i in range(dim)
    )
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {n_cells}),
a AS (SELECT e.vec_id, c.cid, ({d2}) AS d2 FROM embeddings e CROSS JOIN cent c),
r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a),
cells AS (SELECT vec_id, cid AS cell FROM r WHERE rn = 1),
n AS (SELECT vec_id, embedding, {norm} AS nrm FROM embeddings),
losers AS (SELECT DISTINCT cb.vec_id
           FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
           JOIN n an ON an.vec_id = ca.vec_id
           JOIN n bn ON bn.vec_id = cb.vec_id
           WHERE ({pair_dot}) / (an.nrm * bn.nrm) >= {threshold}),
surv AS (SELECT c.vec_id, c.cell FROM cells c
         LEFT JOIN losers l ON c.vec_id = l.vec_id WHERE l.vec_id IS NULL)
SELECT cell, count(*) AS n_survivors, min(vec_id) AS min_id,
       max(vec_id) AS max_id, CAST(sum(vec_id) AS BIGINT) AS id_sum
FROM surv GROUP BY cell ORDER BY cell
"""


QUERIES["semantic_dedup"] = q_semantic_dedup
ORACLES["semantic_dedup"] = _gen_semantic_dedup_oracle()


# ---------------------------------------------------------------------------
# Batch time-window dedup (keep first of each burst)
# ---------------------------------------------------------------------------


def q_dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of stream_dedup_watermark: per (user, event_type),
    events arriving within 30 minutes of the previous one are burst
    duplicates — keep only each burst's first event.  One window
    (lag + gap flag) on a single hash exchange of (user_id,
    event_type); the survivors aggregate on the SAME partitioning.
    The keep-decision is the gaps-and-islands shape, so a SQL oracle
    replays it row for row (vs the streaming variant's state-store
    eviction, which only a rows-only check could see)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    keep = gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000)
    kept = ev.select("user_id", "event_type", "ts", keep.alias("keep")).where(
        "keep"
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


_ORACLE_DEDUP_TW = """
WITH m AS (
  SELECT user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events),
kept AS (
  SELECT * FROM m
  WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE)
SELECT event_type, count(*) AS n_kept,
       count(DISTINCT user_id) AS n_users
FROM kept GROUP BY event_type ORDER BY event_type
"""

QUERIES["dedup_time_window"] = q_dedup_time_window
ORACLES["dedup_time_window"] = _ORACLE_DEDUP_TW


# ---------------------------------------------------------------------------
# Winsorized robust statistics
# ---------------------------------------------------------------------------


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-group statistics: clamp l_extendedprice to
    its group's [p05, p95] (winsorization), report mean before/after.
    The percentile pass and the clamp pass share the group key, and
    the tiny per-group bounds frame re-joins as a broadcast — the fact
    table shuffles once.  (Exact percentiles by choice: the t-digest /
    approx_percentile operators are the 100 TB substitutes; this
    query's subject is the clamp semantics.)"""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(bounds), "l_returnflag"
    )
    clamped = F.greatest(F.least(F.col("l_extendedprice"), F.col("hi")), F.col("lo"))
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("l_extendedprice"), 4).alias("mean_raw"),
            F.round(F.avg(clamped), 4).alias("mean_winsor"),
            F.round(F.first("lo"), 4).alias("p05"),
            F.round(F.first("hi"), 4).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_WINSOR = """
WITH b AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1)
SELECT l.l_returnflag, count(*) AS n,
       round(avg(l.l_extendedprice), 4) AS mean_raw,
       round(avg(greatest(least(l.l_extendedprice, b.hi), b.lo)), 4)
         AS mean_winsor,
       round(any_value(b.lo), 4) AS p05,
       round(any_value(b.hi), 4) AS p95
FROM lineitem l JOIN b USING (l_returnflag)
GROUP BY 1 ORDER BY 1
"""

QUERIES["winsorized_stats"] = q_winsorized_stats
ORACLES["winsorized_stats"] = _ORACLE_WINSOR


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peel, unrolled oracle)
# ---------------------------------------------------------------------------


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the 1995 part co-occurrence graph: iteratively peel
    nodes with degree < 4 until stable (operators/graph.py::k_core;
    measured peel depth 4/5/6 at sf0.001/0.01/0.1 — the 8-step cap
    leaves room for the confirming no-op peel at every sf, and the
    engine exits at the fixpoint instead of running the cap out).
    The oracle unrolls the identical peel as chained MATERIALIZED
    CTEs (the pagerank convention for iterative algorithms; extra
    unrolled steps are no-ops past the fixpoint)."""
    from ..operators.graph import k_core

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    return k_core(edges, k=4, steps=8)


def _gen_kcore_oracle(k: int = 3, steps: int = 8) -> str:
    # MATERIALIZED: DuckDB inlines plain CTEs, so a chained peel
    # would expand 3^steps references to the base scan (observed as
    # "Too many open files" at steps=8)
    parts = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
       FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p)"""
    ]
    for i in range(steps + 1):  # one extra peel for the fixpoint check
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n, count(*) AS d FROM "
            f"(SELECT u AS n FROM e{i} UNION ALL SELECT v FROM e{i}) "
            f"GROUP BY 1)"
        )
        parts.append(
            f"e{i+1} AS MATERIALIZED (SELECT e.u, e.v FROM e{i} e "
            f"JOIN d{i} du ON du.n = e.u AND du.d >= {k} "
            f"JOIN d{i} dv ON dv.n = e.v AND dv.d >= {k})"
        )
    n, n1 = steps, steps + 1
    joined = ",\n".join(parts)
    return f"""
WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            WHERE year(l_shipdate) = 1995),
{joined}
SELECT (SELECT count(*) FROM (SELECT u FROM e{n} UNION SELECT v FROM e{n}))
         AS n_core_nodes,
       (SELECT count(*) FROM e{n}) AS n_core_edges,
       (SELECT count(*) FROM e{n1}) = (SELECT count(*) FROM e{n})
         AS converged
"""


QUERIES["kcore"] = q_kcore
ORACLES["kcore"] = _gen_kcore_oracle(k=4)


# ---------------------------------------------------------------------------
# Interval overlap join (bucketed, report-once)
# ---------------------------------------------------------------------------


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-order detection: per customer, count pairs of
    orders whose fulfillment windows [o_orderdate, max l_shipdate]
    overlap (operators/range_join.py::interval_overlap_pairs).  The
    bucketed self-join keeps the shuffle key (customer, span-bucket)
    and the report-once filter emits each of the ~459k overlapping
    pairs exactly once with NO distinct() exchange — the oracle is
    the plain inequality theta-join (semantics, not strategy)."""
    from ..operators.range_join import interval_overlap_pairs

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(
            li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ship_end")),
            orders["o_orderkey"] == F.col("l_orderkey"),
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "ship_end")
    )
    # bucket ≈ median interval span (734 days measured at sf0.1):
    # replication is span/bucket ≈ 1-2 buckets per interval instead
    # of ~25 with month buckets (measured 6.7 s -> ~1 s)
    pairs = interval_overlap_pairs(
        iv, key="o_custkey", id_col="o_orderkey",
        start="o_orderdate", end="ship_end",
        bucket_seconds=730 * 86400,
    )
    return (
        pairs.groupBy("o_custkey")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), "o_custkey")
        .limit(20)
    )


_ORACLE_INTERVAL_OVERLAP = """
WITH iv AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate AS s,
         max(l.l_shipdate) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3)
SELECT a.o_custkey, count(*) AS n_overlaps
FROM iv a JOIN iv b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.s <= b.e AND b.s <= a.e
GROUP BY 1 ORDER BY n_overlaps DESC, a.o_custkey LIMIT 20
"""

QUERIES["interval_overlap"] = q_interval_overlap
ORACLES["interval_overlap"] = _ORACLE_INTERVAL_OVERLAP


# ---------------------------------------------------------------------------
# Sliding-window chunking (RAG / embedding prep)
# ---------------------------------------------------------------------------


def q_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks with stride 24 (25% overlap) over
    the documents corpus (operators/text.py::sliding_chunks) — pure
    codegen, zero shuffles before the ordered sample.  Chunk text is
    md5-prefixed so the gate is content-sensitive while the compared
    frame stays narrow."""
    from ..operators.text import sliding_chunks

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    ch = sliding_chunks(docs, chunk_tokens=32, stride=24)
    return (
        ch.select(
            "doc_id",
            "chunk_id",
            "start_tok",
            "n_toks",
            F.substring(F.md5("chunk_text"), 1, 8).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


_ORACLE_SLIDING_CHUNKS = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 40),
s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, 24)) AS start_tok,
         generate_subscripts(range(0, greatest(len(toks) - 1, 0) + 1, 24), 1) - 1
           AS chunk_id
  FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, chunk_id, start_tok,
         toks[start_tok + 1 : start_tok + 32] AS piece
  FROM s)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(start_tok AS INTEGER) AS start_tok,
       CAST(len(piece) AS INTEGER) AS n_toks,
       substr(md5(array_to_string(piece, ' ')), 1, 8) AS chunk_md5
FROM c ORDER BY doc_id, chunk_id
"""

QUERIES["sliding_chunks"] = q_sliding_chunks
ORACLES["sliding_chunks"] = _ORACLE_SLIDING_CHUNKS


# ---------------------------------------------------------------------------
# BPE merge-candidate mining (tokenizer-training step 1)
# ---------------------------------------------------------------------------


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First round of BPE training: count adjacent symbol pairs
    inside words (symbols = characters at round 0) across the corpus
    and rank the top merge candidates.  Shape: words dedup to a
    (word, count) table FIRST — the classic BPE trick, pair counting
    is then proportional to VOCABULARY size, not corpus size — and
    the pair explode is a pure codegen transform over the word's
    character array.  Everything before the final top-k is two
    map-side-combinable aggregations."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"[^a-z]+"),
                    lambda w: w != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    chars = F.split(F.col("word"), "")
    pairs = words.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1),"
                " i -> concat(substring(word, i, 1), ' ',"
                "             substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
    ).where(F.char_length("word") >= 2)
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(25)
    )


_ORACLE_BPE = r"""
WITH words AS (
  SELECT w AS word, count(*) AS wc
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS w
        FROM documents)
  GROUP BY 1),
pairs AS (
  SELECT wc,
         unnest(list_transform(range(1, length(word)),
                               i -> substr(word, i, 1) || ' ' ||
                                    substr(word, i + 1, 1))) AS pair
  FROM words WHERE length(word) >= 2)
SELECT pair, CAST(sum(wc) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 25
"""

QUERIES["bpe_merge_candidates"] = q_bpe_merge_candidates
ORACLES["bpe_merge_candidates"] = _ORACLE_BPE


# ---------------------------------------------------------------------------
# Native-tier reduce (aggregate() fold) gate query
# ---------------------------------------------------------------------------


def q_jq_native_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-compiler growth: jq ``reduce`` with CUSTOM arithmetic
    folds (sum, sum of squares, alternating-scaled fold) compiled
    entirely to Catalyst aggregate() HOFs — native='require' fails
    loudly on any Python fallback.  Per-order JSON docs carry the
    sorted quantity array (produce-then-process round trip, the
    jq_native_arrayfns convention); the oracle recomputes every fold
    from the base tables with list_reduce."""
    from ..udtf import jq_explode

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qtys"))
        .select(
            F.to_json(
                F.struct(F.col("o_orderkey").alias("id"), "qtys")
            ).alias("j")
        )
    )
    prog = (
        "{id: .id,"
        " total: (reduce .qtys[] as $q (0; . + $q)),"
        " sumsq: (reduce .qtys[] as $q (0; . + $q * $q)),"
        " fold:  (reduce .qtys[] as $q (1; . * 2 - $q / 2))}"
    )
    x = jq_explode(
        docs, "j", prog,
        "id:bigint", "total:double", "sumsq:double", "fold:double",
        native="require",
    )
    return (
        x.select(
            "id",
            F.round("total", 4).alias("total"),
            F.round("sumsq", 4).alias("sumsq"),
            F.round("fold", 4).alias("fold"),
        )
        .orderBy("id")
    )


_ORACLE_JQ_NATIVE_REDUCE = """
WITH q AS (
  SELECT o.o_orderkey AS id,
         list_sort(list(l.l_quantity)) AS qtys
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey < 2000 GROUP BY 1)
SELECT id,
       round(list_reduce(list_prepend(0.0, qtys), (a, x) -> a + x), 4)
         AS total,
       round(list_reduce(list_prepend(0.0, qtys), (a, x) -> a + x * x), 4)
         AS sumsq,
       round(list_reduce(list_prepend(1.0, qtys), (a, x) -> a * 2 - x / 2), 4)
         AS fold
FROM q ORDER BY id
"""

QUERIES["jq_native_reduce"] = q_jq_native_reduce
ORACLES["jq_native_reduce"] = _ORACLE_JQ_NATIVE_REDUCE


# ---------------------------------------------------------------------------
# Multimodal feature extraction (Arrow decode path, per-value gate)
# ---------------------------------------------------------------------------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (operators/multimodal.py::extract_features): documents packed as
    media, the deterministic stride-histogram decoder (the disclosed
    stand-in for a real codec+model) applied per batch via
    mapInPandas.  Unlike multimodal_stats (metadata-only aggregate),
    this gate checks every FEATURE VALUE: the fake decoder is
    byte-arithmetic the oracle replays exactly (documents are pure
    single-byte text, so char stride == byte stride)."""
    from ..operators.multimodal import docs_as_media, extract_features

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = extract_features(docs_as_media(docs), dim=8)
    # features are float32 on the wire (the right width for 100 TB
    # embeddings); every possible value is k/997 (k < 997), and an
    # exhaustive check shows all 997 values round identically at 4
    # decimals through the float32 round-trip (min distance to a
    # rounding boundary 5.0e-8 vs max float32 error 3.0e-8), so the
    # double-cast + round(4) gate is exact, not probabilistic
    cols = [
        F.round(F.element_at("feature", i + 1).cast("double"), 4).alias(f"f{i}")
        for i in range(8)
    ]
    return (
        feats.select("media_id", "decode_ok", *cols).orderBy("media_id")
    )


_ORACLE_MM_FEATURES = """
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
p0 AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM base),
pos AS (
  SELECT doc_id, i, ord(substr(text, CAST(i AS INTEGER), 1)) AS b FROM p0),
lanes AS (
  SELECT doc_id, (i - 1) % 8 AS lane, sum(b) AS s
  FROM pos GROUP BY 1, 2),
f AS (SELECT doc_id, lane, round((s % 997) / 997.0, 4) AS fv FROM lanes)
SELECT b.doc_id AS media_id, true AS decode_ok,
       coalesce(max(CASE WHEN lane = 0 THEN fv END), 0.0) AS f0,
       coalesce(max(CASE WHEN lane = 1 THEN fv END), 0.0) AS f1,
       coalesce(max(CASE WHEN lane = 2 THEN fv END), 0.0) AS f2,
       coalesce(max(CASE WHEN lane = 3 THEN fv END), 0.0) AS f3,
       coalesce(max(CASE WHEN lane = 4 THEN fv END), 0.0) AS f4,
       coalesce(max(CASE WHEN lane = 5 THEN fv END), 0.0) AS f5,
       coalesce(max(CASE WHEN lane = 6 THEN fv END), 0.0) AS f6,
       coalesce(max(CASE WHEN lane = 7 THEN fv END), 0.0) AS f7
FROM base b LEFT JOIN f ON f.doc_id = b.doc_id
GROUP BY 1 ORDER BY media_id
"""

QUERIES["multimodal_features"] = q_multimodal_features
ORACLES["multimodal_features"] = _ORACLE_MM_FEATURES
