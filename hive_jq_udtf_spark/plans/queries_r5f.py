"""Round-5 continuation wave E: corpus-statistics and embedding-eval
operators — a Zipf's-law exponent fit over the word-frequency
distribution, per-source exact-duplication ratios, and a
leave-one-out k-NN classification readout over the labeled
embeddings (the standard embedding-quality probe before spending
training compute on a corpus).

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# zipf_fit — log-log OLS over the top-1000 word frequencies
# ---------------------------------------------------------------------------


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS of ln(freq) on ln(rank) over the 1000 most
    frequent words — natural text gives slope ≈ −1; a flat slope
    flags synthetic or templated corpora (a cheap corpus-health
    screen).  One token-count shuffle (map-combined), a top-1000
    rank window over the aggregated vocabulary, then closed-form OLS
    moments in a single 1-row aggregate.  Ranks tie-break by word so
    both engines see the identical point set."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.orderBy(F.desc("c"), "w")
    # rank-filter, NOT .limit(): limit after a window select gives an
    # arbitrary subset in Spark; rn <= 1000 pins the exact point set
    top = (
        freqs.select(
            F.row_number().over(wr).alias("rn"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
        .where(F.col("rn") <= 1000)
        .select(F.log(F.col("rn").cast("double")).alias("x"), "y")
    )
    m = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    r_num = F.col("mxy") - F.col("mx") * F.col("my")
    r2 = (r_num * r_num) / (
        (F.col("mxx") - F.col("mx") * F.col("mx"))
        * (F.col("myy") - F.col("my") * F.col("my"))
    )
    return m.select(
        F.col("n").alias("n_words"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    )


_ORACLE_ZIPF = """
WITH freqs AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1),
top AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x,
         ln(CAST(c AS DOUBLE)) AS y
  FROM freqs ORDER BY c DESC, w LIMIT 1000),
m AS (
  SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my, avg(x * y) AS mxy,
         avg(x * x) AS mxx, avg(y * y) AS myy
  FROM top)
SELECT n AS n_words,
       round((mxy - mx * my) / (mxx - mx * mx), 4) AS zipf_slope,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 4) AS intercept,
       round((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)), 4) AS r2
FROM m
"""


# ---------------------------------------------------------------------------
# source_dup_ratio — exact duplication per source
# ---------------------------------------------------------------------------


def q_source_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate pressure per source: documents vs distinct
    texts and the implied dup ratio — the per-provider triage number
    that decides where dedup compute goes first.  One grouped
    aggregate; countDistinct is partial-aggregated on the text hash
    (at 100 TB swap in the repo's HLL sketch for the distinct when
    ±2 % suffices, hll_distinct)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 4).alias("dup_ratio"),
        )
        .orderBy("source")
    )


_ORACLE_SOURCE_DUP = """
SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
       round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4) AS dup_ratio
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# knn_label_eval — leave-one-out 5-NN majority-vote accuracy
# ---------------------------------------------------------------------------


def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: leave-one-out 5-nearest-neighbor
    majority-vote accuracy per true label, over a deterministic 1/10
    query sample (vec_id % 10 = 0) against the full corpus.  Cosine
    scores run in whole-stage codegen (zip_with/aggregate HOFs); the
    top-5 cut is a per-query rank window (WindowGroupLimit) and the
    vote a count-desc/label-asc mode — every tie broken
    deterministically so the oracle matches row-for-row.  At scale
    the corpus side swaps to the IVF/PQ index (similarity.py) — this
    exact variant IS the recall baseline those are judged against."""
    from ..operators.similarity import dot_col, norm_col

    emb = load_table(spark, sf_dir, "embeddings")
    # norms are per-VECTOR quantities — hoist them out of the pair
    # join (computing them per pair multiplies the HOF work by the
    # other side's cardinality); the per-pair expression is then just
    # the dot product.  Same formula dot/(|q||c|), bit-identical;
    # kernels shared with the similarity operator module.
    q = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
        F.col("label").alias("qlabel"),
    ).withColumn("nq", norm_col(F.col("qe")))
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("ce"),
        F.col("label").alias("clabel"),
    ).withColumn("nc", norm_col(F.col("ce")))
    dot = dot_col(F.col("qe"), F.col("ce"))
    scored = (
        q.crossJoin(c)
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "qlabel",
            "cid",
            "clabel",
            (dot / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    top5 = scored.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") <= 5)
    votes = top5.groupBy("qid", "qlabel", "clabel").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("v"), "clabel")
    pred = (
        votes.withColumn("rv", F.row_number().over(wv))
        .where(F.col("rv") == 1)
        .select("qid", "qlabel", F.col("clabel").alias("pred"))
    )
    return (
        pred.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.avg(F.when(F.col("pred") == F.col("qlabel"), 1.0).otherwise(0.0)), 4
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


_ORACLE_KNN = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS qlabel
  FROM embeddings WHERE vec_id % 10 = 0),
c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, label AS clabel
  FROM embeddings),
scored AS (
  SELECT qid, qlabel, cid, clabel, list_cosine_similarity(qe, ce) AS cos
  FROM q CROSS JOIN c WHERE qid <> cid),
top5 AS (
  SELECT * FROM (
    SELECT qid, qlabel, clabel,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
    FROM scored) WHERE rk <= 5),
votes AS (
  SELECT qid, qlabel, clabel, count(*) AS v FROM top5 GROUP BY 1, 2, 3),
pred AS (
  SELECT qid, qlabel, clabel AS pred FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY v DESC, clabel) AS rv
    FROM votes) WHERE rv = 1)
SELECT qlabel AS label, count(*) AS n_queries,
       round(avg(CASE WHEN pred = qlabel THEN 1.0 ELSE 0.0 END), 4) AS accuracy
FROM pred GROUP BY 1 ORDER BY 1
"""


QUERIES["zipf_fit"] = q_zipf_fit
ORACLES["zipf_fit"] = _ORACLE_ZIPF
QUERIES["source_dup_ratio"] = q_source_dup_ratio
ORACLES["source_dup_ratio"] = _ORACLE_SOURCE_DUP
QUERIES["knn_label_eval"] = q_knn_label_eval
ORACLES["knn_label_eval"] = _ORACLE_KNN


# ---------------------------------------------------------------------------
# dbscan_clusters — density-based clustering summary
# ---------------------------------------------------------------------------


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding column (eps = 1.15, min_pts = 3):
    per-cluster size / core / border counts plus the noise bucket
    (cluster −1).  The operator decomposes into an eps-radius
    similarity join, a degree filter, connected components over the
    core-core subgraph (reused label-propagation operator), and a
    min-rule border assignment — every step relational, every tie
    deterministic (operators/dbscan.py).  The oracle replays the
    definition with a recursive reachability CTE.  The gate runs on a
    deterministic 1/5 subsample (vec_id % 5 = 0): exact all-pairs
    DBSCAN is O(n²d) by definition, and the subsample keeps the
    driver-checked query at bench scale while the operator itself
    stays full-corpus (its scale path is swapping the all-pairs
    candidate generator for the IVF cell index, see dbscan.py)."""
    from ..operators.dbscan import dbscan_embeddings

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    asgn = dbscan_embeddings(emb, eps=1.15, min_pts=3)
    return (
        asgn.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sum(F.when(F.col("is_core"), 1).otherwise(0)).alias("n_core"),
            F.sum(F.when(F.col("is_core"), 0).otherwise(1)).alias("n_border_or_noise"),
        )
        .orderBy("cluster")
    )


_ORACLE_DBSCAN = """
WITH RECURSIVE e AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id % 5 = 0),
half AS (
  SELECT a.id AS x, b.id AS y FROM e a JOIN e b
  ON a.id < b.id AND list_distance(a.v, b.v) <= 1.15),
sym AS (SELECT x, y FROM half UNION ALL SELECT y, x FROM half),
deg AS (SELECT x, count(*) AS nbrs FROM sym GROUP BY 1),
core AS (SELECT x AS id FROM deg WHERE nbrs >= 3),
cce AS (
  SELECT s.x, s.y FROM sym s
  JOIN core c1 ON s.x = c1.id JOIN core c2 ON s.y = c2.id),
walk(id, comp) AS (
  SELECT x, x FROM cce
  UNION
  SELECT c.x, w.comp FROM cce c JOIN walk w ON c.y = w.id),
comp0 AS (SELECT id, min(comp) AS cluster FROM walk GROUP BY id),
comp AS (
  SELECT * FROM comp0
  UNION ALL
  SELECT id, id FROM core WHERE id NOT IN (SELECT id FROM comp0)),
border AS (
  SELECT s.x AS id, min(c.cluster) AS cluster
  FROM sym s JOIN comp c ON s.y = c.id
  WHERE s.x NOT IN (SELECT id FROM core)
  GROUP BY 1),
asgn AS (
  SELECT id, cluster, TRUE AS is_core FROM comp
  UNION ALL
  SELECT id, cluster, FALSE AS is_core FROM border),
alle AS (
  SELECT e.id, coalesce(a.cluster, -1) AS cluster,
         coalesce(a.is_core, FALSE) AS is_core
  FROM e LEFT JOIN asgn a ON e.id = a.id)
SELECT cluster, count(*) AS size,
       CAST(sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
       CAST(sum(CASE WHEN is_core THEN 0 ELSE 1 END) AS BIGINT) AS n_border_or_noise
FROM alle GROUP BY 1 ORDER BY 1
"""


QUERIES["dbscan_clusters"] = q_dbscan_clusters
ORACLES["dbscan_clusters"] = _ORACLE_DBSCAN


# ---------------------------------------------------------------------------
# seasonality_index — day-of-week multiplicative decomposition
# ---------------------------------------------------------------------------


def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonality per event_type: the
    average daily count for each weekday divided by the overall
    average daily count — index > 1 marks the hot days.  Two stacked
    aggregations (events → daily counts → weekday means) and one
    broadcast join of the per-type overall means; everything after
    the first shuffle is O(types × 7)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.avg("x").alias("dow_avg"), F.count(F.lit(1)).alias("n_days")
    )
    overall = daily.groupBy("event_type").agg(F.avg("x").alias("all_avg"))
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            "n_days",
            F.round(F.col("dow_avg") / F.col("all_avg"), 4).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


_ORACLE_SEASONALITY = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         dayofweek(ts) + 1 AS dow, CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2, 3),
per_dow AS (
  SELECT event_type, dow, avg(x) AS dow_avg, count(*) AS n_days
  FROM daily GROUP BY 1, 2),
o AS (SELECT event_type, avg(x) AS all_avg FROM daily GROUP BY 1)
SELECT p.event_type, CAST(p.dow AS INTEGER) AS dow,
       CAST(p.n_days AS BIGINT) AS n_days,
       round(p.dow_avg / o.all_avg, 4) AS seasonal_index
FROM per_dow p JOIN o ON p.event_type = o.event_type
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# ntile_deciles — decile profile of order values per segment
# ---------------------------------------------------------------------------


def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profile of order totals within each market segment:
    ntile(10) over a fully deterministic order (price, then orderkey)
    so both engines cut identical buckets, then per-decile count /
    min / max.  The window sorts per segment — at scale this is the
    classic quantile-profile query served by range partitioning on
    (segment, price) or, approximately, by the GK/t-digest sketches."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"), orders.o_custkey == cust.c_custkey
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return (
        j.select("c_mktsegment", "o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("c_mktsegment", "decile")
    )


_ORACLE_NTILE = """
SELECT c_mktsegment, decile, count(*) AS n,
       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM (
  SELECT c.c_mktsegment, o.o_totalprice,
         ntile(10) OVER (PARTITION BY c.c_mktsegment
                         ORDER BY o.o_totalprice, o.o_orderkey) AS decile
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES["seasonality_index"] = q_seasonality_index
ORACLES["seasonality_index"] = _ORACLE_SEASONALITY
QUERIES["ntile_deciles"] = q_ntile_deciles
ORACLES["ntile_deciles"] = _ORACLE_NTILE
