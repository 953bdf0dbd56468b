"""Round-5 continuation wave A: TPC-H-shaped relational analytics
adapted to the driver's schema (no partsupp / shipmode / phone
columns — each query states its adaptation).  These widen the
host-engine composition surface (SURVEY §2.3) with the classic
multi-join + aggregate shapes a reference user runs around the jq
UDTF (reference README.md:121 composes the UDTF inside exactly this
kind of Hive SQL).

Scale notes common to the wave: nation/region are broadcast
(25 / 5 rows at any SF); part and supplier are broadcast-size until
~sf100 and AQE converts those joins back to shuffle joins past the
threshold automatically; every groupBy keys on low-cardinality
(nation, year, month, priority) columns so partial aggregation
collapses the shuffle to a few hundred rows regardless of fact-table
size.  Price sums follow the repo convention (queries.py:276): sum
in DECIMAL(30,6), round(4), cast double — add-order-insensitive so
the driver's value hash is stable.

Registers into plans.queries.QUERIES/ORACLES on import (same pattern
as queries_r3/r4/r5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


def _dec_rev(price="l_extendedprice", disc="l_discount"):
    """Revenue term summed exactly in decimal (add-order-stable)."""
    return (F.col(price) * (1 - F.col(disc))).cast("decimal(30,6)")


# ---------------------------------------------------------------------------
# volume_shipping — TPC-H Q7 shape
# ---------------------------------------------------------------------------


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue shipped between two nations, by supplier-nation /
    customer-nation / ship-year.  lineitem joins supplier (broadcast
    at test SF; AQE re-plans at scale) and orders→customer; both
    nation joins broadcast 25 rows.  The pair filter is pushed below
    the fact join via the nation-key semi-condition, so only ~ (2/25)²
    of lineitem survives into the wide join.  Final groupBy is
    (nation, nation, year) — tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = supp.join(F.broadcast(n1), supp.s_nationkey == n1.s_nk).select(
        "s_suppkey", "supp_nation"
    )
    c = cust.join(F.broadcast(n2), cust.c_nationkey == n2.c_nk).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_dec_rev()), 4).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_ORACLE_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(rev), 4) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# market_share — TPC-H Q8 shape
# ---------------------------------------------------------------------------


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_5's share of ECONOMY-part revenue sold to ASIA
    customers, per order-year.  part filter (1/6 of parts) is pushed
    into the broadcast build side; the share is a conditional-sum /
    sum over the same aggregated frame — one pass, no self-join.
    Adaptation: p_type = 'PROMO'-style single-word types (driver
    schema), share nation fixed to NATION_5."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    asia_nations = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey")
    )
    c = cust.join(
        F.broadcast(asia_nations), cust.c_nationkey == asia_nations.n_nationkey
    ).select("c_custkey")
    p = part.where(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = supp.join(
        F.broadcast(
            nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))
        ),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", _dec_rev()))
                / F.sum(_dec_rev()),
                6,
            )
            .cast("double")
            .alias("mkt_share"),
            F.round(F.sum(_dec_rev()), 4).cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


_ORACLE_MARKET_SHARE = """
SELECT o_year,
       CAST(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev END) / sum(rev), 6) AS DOUBLE) AS mkt_share,
       CAST(round(sum(rev), 4) AS DOUBLE) AS total_revenue
FROM (
  SELECT year(o.o_orderdate) AS o_year, n1.n_name AS supp_nation,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
) GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# returned_items — TPC-H Q10 shape
# ---------------------------------------------------------------------------


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returns (l_returnflag = 'R') per customer,
    top 20.  The returnflag filter is pushed to the parquet scan; the
    per-customer aggregate runs BEFORE the customer-attribute join so
    the join input is |customers-with-returns|, not |lineitem|; the
    final top-20 is a WindowGroupLimit-free global orderBy+limit
    (rows already ≤ |customers|)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lost = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders.select("o_orderkey", "o_custkey"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_dec_rev()), 4).cast("double").alias("lost_revenue"))
    )
    return (
        lost.join(cust, lost.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "nation", F.round("c_acctbal", 2).alias("acctbal"),
                "lost_revenue")
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


_ORACLE_RETURNED_ITEMS = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       round(c.c_acctbal, 2) AS acctbal,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))), 4) AS DOUBLE)
         AS lost_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# customer_distribution — TPC-H Q13 shape
# ---------------------------------------------------------------------------


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of customers by order count, INCLUDING the
    zero-order bucket via a left outer join (count(o_orderkey) skips
    nulls exactly like the reference SQL).  Two aggregations over
    progressively tiny frames — the second groupBy input is
    |customers| rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        cust.select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
) GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# promo_revenue_share — TPC-H Q14 shape
# ---------------------------------------------------------------------------


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: monthly share of revenue from PROMO-type parts.  part is
    the broadcast build side (only p_partkey/p_type read — column
    pruning reaches the scan); conditional sum / sum in one grouped
    pass per (year, month)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    p = part.select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("l_year"),
            F.month("l_shipdate").alias("l_month"),
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _dec_rev()).otherwise(
                    F.lit(0).cast("decimal(30,6)")))
                / F.sum(_dec_rev()),
                6,
            )
            .cast("double")
            .alias("promo_pct"),
        )
        .orderBy("l_year", "l_month")
    )


_ORACLE_PROMO_REVENUE_SHARE = """
SELECT year(l.l_shipdate) AS l_year, month(l.l_shipdate) AS l_month,
       CAST(round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))
                ELSE CAST(0 AS DECIMAL(30,6)) END)
            / sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))), 6) AS DOUBLE)
         AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# large_volume_customers — TPC-H Q18 shape
# ---------------------------------------------------------------------------


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 300, with customer
    attribution.  The heavy aggregate (per-order quantity sum) runs
    first and the >300 filter drops ~99.9% of orders BEFORE any join —
    the subsequent joins are against a few-hundred-row frame and
    broadcast automatically under AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_name"), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            # string render: the driver canonicalizer sees pandas date
            # vs Timestamp as different types (repo convention for
            # date-valued output columns)
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
    )


_ORACLE_LARGE_VOLUME_CUSTOMERS = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice, t.total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 4) > 300
) t
JOIN orders o ON t.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice DESC, o.o_orderkey
"""


# ---------------------------------------------------------------------------
# dormant_customers — TPC-H Q22 shape (adapted)
# ---------------------------------------------------------------------------


def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted (driver schema has no phone column): customers with
    above-average account balance and NO orders after 2000-01-01,
    counted per nation with their waiting balance.  The average is a
    scalar subquery (1-row broadcast); the "no recent orders" test is
    a left-anti join against the date-filtered orders projection —
    the filter is pushed to the orders scan so the anti build side is
    small.  This is the null-aware anti-join shape from SURVEY §2.3."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit("2000-01-01")).select(
        "o_custkey"
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        rich.join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            rich.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("nation")
    )


_ORACLE_DORMANT_CUSTOMERS = """
SELECT n.n_name AS nation, count(*) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# late_shipments — TPC-H Q12 shape (adapted)
# ---------------------------------------------------------------------------


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted (no shipmode column): lineitems shipped more than
    60 days after the order date, split into high-priority
    (1-URGENT / 2-HIGH) vs lower-priority counts per ship-year.  The
    lateness predicate references both sides so it evaluates post-join,
    but the join itself is the orderkey equi-join and the grouped
    output is (year × 2 counts) — the canonical conditional-count
    shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_year")
    )


_ORACLE_LATE_SHIPMENTS = """
SELECT year(l.l_shipdate) AS l_year,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1 ORDER BY 1
"""


QUERIES["volume_shipping"] = q_volume_shipping
ORACLES["volume_shipping"] = _ORACLE_VOLUME_SHIPPING
QUERIES["market_share"] = q_market_share
ORACLES["market_share"] = _ORACLE_MARKET_SHARE
QUERIES["returned_items"] = q_returned_items
ORACLES["returned_items"] = _ORACLE_RETURNED_ITEMS
QUERIES["customer_distribution"] = q_customer_distribution
ORACLES["customer_distribution"] = _ORACLE_CUSTOMER_DISTRIBUTION
QUERIES["promo_revenue_share"] = q_promo_revenue_share
ORACLES["promo_revenue_share"] = _ORACLE_PROMO_REVENUE_SHARE
QUERIES["large_volume_customers"] = q_large_volume_customers
ORACLES["large_volume_customers"] = _ORACLE_LARGE_VOLUME_CUSTOMERS
QUERIES["dormant_customers"] = q_dormant_customers
ORACLES["dormant_customers"] = _ORACLE_DORMANT_CUSTOMERS
QUERIES["late_shipments"] = q_late_shipments
ORACLES["late_shipments"] = _ORACLE_LATE_SHIPMENTS


# ---------------------------------------------------------------------------
# top_supplier_revenue — TPC-H Q15 shape
# ---------------------------------------------------------------------------


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) achieving the maximum three-month revenue
    (1996-Q1 ship dates).  The revenue "view" aggregates lineitem
    once; the max is a 1-row broadcast joined back — the scalar-
    subquery shape, never a re-scan of the fact table.  Ties (all
    maximal suppliers) are kept exactly as the reference SQL does."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_dec_rev()), 4).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mr"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 4)
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# small_quantity_revenue — TPC-H Q17 shape
# ---------------------------------------------------------------------------


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: average yearly revenue lost if small orders (below 20 %
    of the part's own average quantity) were not filled, for one
    brand.  The per-part average is a grouped aggregate joined back
    to the same scan's rows — Catalyst plans the correlated scalar
    subquery as an aggregate + join, NOT a per-row re-scan; the brand
    filter broadcasts into both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    p = part.where(F.col("p_brand") == "Brand#11").select("p_partkey")
    filtered = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    avg_q = filtered.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("q_fence")
    )
    return (
        filtered.join(avg_q, "l_partkey")
        .where(F.col("l_quantity") < F.col("q_fence"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")) / 7.0, 4
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_ORACLE_SMALL_QUANTITY = """
WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
f AS (SELECT l.* FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey),
a AS (SELECT l_partkey, avg(l_quantity) * 0.2 AS q_fence FROM f GROUP BY 1)
SELECT CAST(round(sum(CAST(f.l_extendedprice AS DECIMAL(30,6))) / 7.0, 4) AS DOUBLE)
         AS avg_yearly,
       count(*) AS n_lines
FROM f JOIN a ON f.l_partkey = a.l_partkey
WHERE f.l_quantity < a.q_fence
"""


QUERIES["top_supplier_revenue"] = q_top_supplier_revenue
ORACLES["top_supplier_revenue"] = _ORACLE_TOP_SUPPLIER
QUERIES["small_quantity_revenue"] = q_small_quantity_revenue
ORACLES["small_quantity_revenue"] = _ORACLE_SMALL_QUANTITY


# ---------------------------------------------------------------------------
# bracketed_revenue — TPC-H Q19 shape
# ---------------------------------------------------------------------------


def q_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from three disjunctive (brand × quantity-bracket ×
    size-bracket) predicates — the classic OR-of-ANDs shape that tests
    predicate normalization: Catalyst pushes the common `l_quantity`
    bounds and the partkey equi-join below the OR, and the part side
    prunes to (p_partkey, p_brand, p_size) only.  Adaptation: the
    driver schema has no container/shipinstruct columns, so the
    brackets use p_size bands instead."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    p = part.select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(b).agg(
        F.round(F.sum(_dec_rev()), 4).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_ORACLE_BRACKETED = """
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))), 4)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


QUERIES["bracketed_revenue"] = q_bracketed_revenue
ORACLES["bracketed_revenue"] = _ORACLE_BRACKETED


# ---------------------------------------------------------------------------
# waiting_suppliers — TPC-H Q21 shape (adapted)
# ---------------------------------------------------------------------------


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers who were the ONLY late supplier on a
    multi-supplier order — the double-correlated EXISTS / NOT EXISTS
    shape (another supplier on the order exists; another LATE
    supplier does not).  Catalyst plans both as semi/anti joins on
    orderkey, no per-row subquery re-execution.  Adaptation: the
    driver schema has no commit/receipt dates, so "late" = shipped
    more than 60 days after the order date; top 10 suppliers by
    waiting count."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    l1 = lo.where(F.col("late")).select("l_orderkey", "l_suppkey").alias("l1")
    others = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    late_others = lo.where(F.col("late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("o2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l1.l_orderkey") == F.col("o3"))
            & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    return (
        waiting.join(supp.select("s_suppkey", "s_name"), waiting.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


_ORACLE_WAITING = """
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT s.s_suppkey, s.s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM lo l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY 1, 2
ORDER BY numwait DESC, s.s_suppkey LIMIT 10
"""


QUERIES["waiting_suppliers"] = q_waiting_suppliers
ORACLES["waiting_suppliers"] = _ORACLE_WAITING
