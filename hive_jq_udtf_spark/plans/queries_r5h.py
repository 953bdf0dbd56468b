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
            F.round(F.avg("monetary"), 2).alias("avg_monetary"),
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
       round(avg(monetary), 2) AS avg_monetary
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
    basket = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = basket.select("l_orderkey").distinct().count()
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
        .select(
            "p1",
            "p2",
            "both",
            F.round(
                (F.col("both") / F.lit(n_orders))
                / (
                    (F.col("c1") / F.lit(n_orders))
                    * (F.col("c2") / F.lit(n_orders))
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
