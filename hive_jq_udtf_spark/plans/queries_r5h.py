"""Round-5 continuation wave G: customer-analytics mining — RFM
(recency/frequency/monetary) segmentation and market-basket lift.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# rfm_segmentation — quintile-scored RFM codes
# ---------------------------------------------------------------------------


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last
    order, against the dataset max date), frequency (order count) and
    monetary (total spend) are each cut into deterministic quintiles
    (ntile over value + custkey tie-break; recency ranks DESC so
    5 = most recent, matching the marketing convention).  Output is
    the segment distribution: one row per 3-digit RFM code with
    count and average spend.  Everything after the one per-customer
    aggregate runs on |customers| rows; the three ntile windows are
    single-pass sorts of that frame."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("mend"))
    per_cust = (
        orders.join(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_o"),
            F.first("mend").alias("mend"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff("mend", "last_o").alias("recency"),
            "frequency",
            "monetary",
        )
    )
    wr = Window.orderBy(F.desc("recency"), "o_custkey")
    wf = Window.orderBy("frequency", "o_custkey")
    wm = Window.orderBy("monetary", "o_custkey")
    scored = per_cust.select(
        "monetary",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # SUM, not avg: the mean of 2-dp values lands exactly on
            # .xx5 half-cent boundaries where Spark (rounds the
            # shortest-decimal repr) and DuckDB (rounds the binary
            # value) disagree; the decimal sum is exact on both
            # (docs/oracle_determinism.md rule 2; review finding)
            F.round(F.sum(F.col("monetary").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_ORACLE_RFM = """
WITH mx AS (SELECT max(o_orderdate) AS mend FROM orders),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), any_value(mx.mend)) AS recency,
         count(*) AS frequency,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS monetary
  FROM orders, mx GROUP BY o_custkey),
scored AS (
  SELECT monetary,
         ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM per_cust)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(round(sum(CAST(monetary AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# basket_lift — co-ordered part pairs by lift
# ---------------------------------------------------------------------------


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: the top-20 part pairs by
    lift = P(a,b) / (P(a)·P(b)) over order baskets, with a minimum
    support of 3 co-occurrences.  The pair generator is the in-order
    self-join on orderkey — fan-out is Σ lines², bounded by basket
    size (≈4 lines/order), not catalog size, so the pair frame grows
    linearly with orders at any scale.  Supports are mergeable counts;
    the two frequency joins shuffle only the (pair, count) frames."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the distinct basket ONCE: it feeds the n_orders
    # count, BOTH self-join sides and the frequency aggregate — four
    # scan+distinct pipelines without this (measured 3.1 -> ~1.6 s)
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r14 (guide §5): the order count rides a 1-row broadcast instead
    # of an eager distinct().count() job over the checkpointed basket.
    n_orders = basket.agg(F.countDistinct("l_orderkey").alias("_no"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("both"))
        .where(F.col("both") >= 3)
    )
    freq = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    return (
        pairs.join(freq.withColumnsRenamed({"l_partkey": "p1", "c": "c1"}), "p1")
        .join(freq.withColumnsRenamed({"l_partkey": "p2", "c": "c2"}), "p2")
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "both",
            F.round(
                (F.col("both") / F.col("_no"))
                / (
                    (F.col("c1") / F.col("_no"))
                    * (F.col("c2") / F.col("_no"))
                ),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(20)
    )


_ORACLE_BASKET = """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM basket),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS both
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3),
freq AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY 1)
SELECT p.p1, p.p2, p.both,
       round((p.both * 1.0 / n.n_orders)
             / ((f1.c * 1.0 / n.n_orders) * (f2.c * 1.0 / n.n_orders)), 4) AS lift
FROM pairs p
JOIN freq f1 ON p.p1 = f1.l_partkey
JOIN freq f2 ON p.p2 = f2.l_partkey
CROSS JOIN n
ORDER BY lift DESC, p.p1, p.p2 LIMIT 20
"""


QUERIES["rfm_segmentation"] = q_rfm_segmentation
ORACLES["rfm_segmentation"] = _ORACLE_RFM
QUERIES["basket_lift"] = q_basket_lift
ORACLES["basket_lift"] = _ORACLE_BASKET


# ---------------------------------------------------------------------------
# hopping_counts — sliding (hopping) time windows in batch
# ---------------------------------------------------------------------------


def q_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window counts: 1-hour windows sliding every 30 minutes
    (each event lands in exactly two windows), via the native
    window(ts, size, slide) TVF — Spark expands the assignment
    inline, no join against a window spine.  Output limited to the
    top 48 densest (window, type) cells with deterministic
    tie-breaks.  The oracle replays the expansion with a 2-row
    unnest per event."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_epoch"),
            "event_type",
            "n",
        )
    )
    return counts.orderBy(F.desc("n"), "win_epoch", "event_type").limit(48)


_ORACLE_HOPPING = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS win_start,
         event_type, ts
  FROM events, unnest([0, 1]) AS t(k)
  WHERE ts >= time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE
    AND ts <  time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE + INTERVAL 1 HOUR),
counts AS (
  SELECT CAST(epoch(win_start) AS BIGINT) AS win_epoch, event_type, count(*) AS n
  FROM expanded GROUP BY 1, 2)
SELECT win_epoch, event_type, n
FROM counts ORDER BY n DESC, win_epoch, event_type LIMIT 48
"""


# ---------------------------------------------------------------------------
# dedup_keep_longest — survivor policy: longest text wins
# ---------------------------------------------------------------------------


def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup grouping with a KEEP-LONGEST survivor policy (ties →
    smallest doc_id): groups key on the text hash, the survivor is a
    rank-1 row per group — WindowGroupLimit keeps the top-k cut below
    the exchange.  Complements minhash_dedup_keep's min-id rule with
    the policy real pipelines actually want (longest variant usually
    carries the most content).  Output: per-source survivor counts
    and the byte mass dropped."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.xxhash64("text")).orderBy(
        F.desc("n_chars"), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0)).alias(
                "chars_dropped"
            ),
        )
        .orderBy("source")
    )


_ORACLE_KEEP_LONGEST = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY text ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dropped
FROM ranked GROUP BY 1 ORDER BY 1
"""


QUERIES["hopping_counts"] = q_hopping_counts
ORACLES["hopping_counts"] = _ORACLE_HOPPING
QUERIES["dedup_keep_longest"] = q_dedup_keep_longest
ORACLES["dedup_keep_longest"] = _ORACLE_KEEP_LONGEST


# ---------------------------------------------------------------------------
# audience_overlap — Jaccard between event-type user populations
# ---------------------------------------------------------------------------


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, the
    Jaccard similarity of their distinct user sets — the segment-
    overlap readout behind campaign planning.  One distinct pass
    builds (type, user); the pair intersection is a self-join on
    user_id (fan-out bounded by types-per-user ≤ 5); unions come from
    the per-type counts, |A∪B| = |A|+|B|−|A∩B|.  At 100 TB the exact
    distinct swaps for the KMV sketch (kmv_set_ops) — this exact
    variant is its accuracy baseline."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"event_type": "type_a", "n": "na"}), "type_a")
        .join(sizes.withColumnsRenamed({"event_type": "type_b", "n": "nb"}), "type_b")
        .select(
            "type_a",
            "type_b",
            "common",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 4
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_ORACLE_AUDIENCE = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS common
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.type_a, i.type_b, i.common,
       round(i.common * 1.0 / (sa.n + sb.n - i.common), 4) AS jaccard
FROM inter i
JOIN sizes sa ON i.type_a = sa.event_type
JOIN sizes sb ON i.type_b = sb.event_type
ORDER BY 1, 2
"""


QUERIES["audience_overlap"] = q_audience_overlap
ORACLES["audience_overlap"] = _ORACLE_AUDIENCE
