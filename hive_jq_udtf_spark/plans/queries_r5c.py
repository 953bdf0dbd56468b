"""Round-5 continuation wave B: classical statistics over the warehouse
tables — two-sample tests (Kolmogorov–Smirnov, Mann–Whitney U),
trailing exponential smoothing, CUSUM changepoint detection, and a
Kaplan–Meier survival curve.  These extend the analytics surface a
reference user composes AROUND the jq UDTF (SURVEY §2.3) with the
hypothesis-testing / monitoring shapes an LLM-data pipeline needs
(distribution drift between slices, regression detection over time).

Scale discipline shared by the wave: every statistic is computed as
  (1) a fully parallel pre-aggregation that collapses the fact table
      to per-distinct-value or per-period counts (map-side combine,
      one shuffle), then
  (2) prefix sums over that aggregated frame via
      ``operators.layout.global_cumsum`` — the two-phase
      range-partitioned ranking, so even the distinct-value frame
      (millions of rows at 100 TB) never collapses to one task.
      Integer prefix sums (ECDF counts, rank offsets, risk sets) are
      EXACT under the two-phase regrouping; the one double prefix
      (Kaplan–Meier's Σ log-survival) drifts by ulps, ≪ the 6-dp
      output rounding.  Per-period frames (day/month keys) keep the
      plain window — their cardinality is bounded by the calendar
      span, not the data volume.
Numeric determinism: final outputs are rounded after prefix sums
whose regrouping error is orders of magnitude below the rounding
grain, so value hashes are stable across engines.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import global_cumsum
from ..sources.tables import load_table
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# ks_two_sample — Kolmogorov–Smirnov D between two customer segments
# ---------------------------------------------------------------------------


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between the order-price
    distributions of the BUILDING and MACHINERY market segments.
    Prices are pre-aggregated to (price → per-segment counts) —
    the only pass over the fact rows — then both empirical CDFs are
    two-phase parallel prefix sums over the distinct-value frame
    (global_cumsum: exact integer counts, no single-task sort; ties
    handled exactly — the ECDF steps by the full tie count).
    D = max |F1−F2|."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == cust.c_custkey,
        )
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("o_totalprice")
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("b"),
        )
    )
    totals = seg.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    ecdf = global_cumsum(seg, ["o_totalprice"], ["a", "b"]).join(
        F.broadcast(totals)
    ).select(
        (F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")).alias("d"),
        "na",
        "nb",
    )
    return ecdf.groupBy("na", "nb").agg(
        F.round(F.max(F.abs(F.col("d"))), 6).alias("ks_stat")
    ).select(F.col("na").alias("n_building"), F.col("nb").alias("n_machinery"), "ks_stat")


_ORACLE_KS = """
WITH seg AS (
  SELECT o.o_totalprice,
         sum(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS b
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1),
t AS (SELECT sum(a) AS na, sum(b) AS nb FROM seg),
ecdf AS (
  SELECT sum(a) OVER (ORDER BY o_totalprice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.na
       - sum(b) OVER (ORDER BY o_totalprice ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.nb
         AS d, t.na, t.nb
  FROM seg, t)
SELECT CAST(na AS BIGINT) AS n_building, CAST(nb AS BIGINT) AS n_machinery,
       round(max(abs(d)), 6) AS ks_stat
FROM ecdf GROUP BY na, nb
"""


# ---------------------------------------------------------------------------
# mannwhitney_u — rank-sum test with tie correction
# ---------------------------------------------------------------------------


def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the same two segments, computed WITHOUT
    materializing per-row ranks: after the per-value count aggregation,
    the average rank of a tied value block is
    (rows strictly below) + (ties + 1) / 2 — an exclusive prefix sum
    over distinct values (global_cumsum's inclusive integer prefix
    minus the row's own count: exact, fully parallel).
    U₁ = R₁ − n₁(n₁+1)/2; z uses the standard tie-corrected variance
    σ² = n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))).
    Everything after the first shuffle runs on |distinct prices| rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == cust.c_custkey,
        )
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("o_totalprice")
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("b"),
        )
        .withColumn("t", F.col("a") + F.col("b"))
    )
    ranked = global_cumsum(seg, ["o_totalprice"], ["t"]).select(
        "a",
        "t",
        (F.col("cum_t") - F.col("t") + (F.col("t") + 1) / 2.0).alias("avg_rank"),
    )
    stats = ranked.agg(
        F.sum(F.col("a") * F.col("avg_rank")).alias("r1"),
        F.sum("a").alias("n1"),
        F.sum(F.col("t") - F.col("a")).alias("n2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - F.col("tie3") / (n * (n - 1)))
    return stats.select(
        n1.alias("n_building"),
        n2.alias("n_machinery"),
        F.round(u1, 4).alias("u_stat"),
        F.round((u1 - n1 * n2 / 2.0) / F.sqrt(sigma2), 6).alias("z_score"),
    )


_ORACLE_MWU = """
WITH seg AS (
  SELECT o.o_totalprice,
         sum(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS b
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1),
ranked AS (
  SELECT a, (a + b) AS t,
         coalesce(sum(a + b) OVER (ORDER BY o_totalprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + ((a + b) + 1) / 2.0 AS avg_rank
  FROM seg),
s AS (
  SELECT sum(a * avg_rank) AS r1, sum(a) AS n1, sum(t - a) AS n2,
         sum(t * t * t - t) AS tie3
  FROM ranked)
SELECT CAST(n1 AS BIGINT) AS n_building, CAST(n2 AS BIGINT) AS n_machinery,
       round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u_stat,
       round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                    - tie3 / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z_score
FROM s
"""


# ---------------------------------------------------------------------------
# ewma_smoothing — trailing exponentially-weighted monthly series
# ---------------------------------------------------------------------------


def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized trailing-6 exponential smoothing (α = 0.3) of the
    daily event count per event_type (the events table spans ~30
    days, so daily is the natural series granularity).  The kernel is the
    FINITE sum Σₖ (1−α)ᵏ·x₍ᵢ₋ₖ₎ / Σₖ (1−α)ᵏ over k = 0..5 written as
    six explicit lag() terms — identical evaluation order on both
    engines, so the doubles match bit-for-bit before rounding.  (The
    infinite-memory recursive EWMA needs either a sequential scan or
    the numerically-unstable (1−α)^(−i) trick; the truncated kernel is
    the standard streaming-safe form and differs by < (1−α)⁶ ≈ 12 %
    of weight, fully documented here.)  Daily pre-aggregation is the
    only pass over events; the lag window runs per event_type over
    ~30 rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    beta = 0.7
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(6):
        term = F.lag("x", k).over(w)
        num = num + F.when(term.isNotNull(), F.lit(beta**k) * term).otherwise(0.0)
        den = den + F.when(term.isNotNull(), F.lit(beta**k)).otherwise(0.0)
    return (
        daily.select(
            "event_type", "day", F.col("x").cast("long").alias("n_events"),
            F.round(num / den, 4).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


_ORACLE_EWMA = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2)
SELECT event_type, day, CAST(x AS BIGINT) AS n_events,
       round((
          coalesce(CAST('1.0' AS DOUBLE) * lag(x, 0) OVER w, 0) +
          coalesce(CAST('0.7' AS DOUBLE) * lag(x, 1) OVER w, 0) +
          coalesce(CAST('0.48999999999999994' AS DOUBLE) * lag(x, 2) OVER w, 0) +
          coalesce(CAST('0.3429999999999999' AS DOUBLE) * lag(x, 3) OVER w, 0) +
          coalesce(CAST('0.24009999999999995' AS DOUBLE) * lag(x, 4) OVER w, 0) +
          coalesce(CAST('0.16806999999999994' AS DOUBLE) * lag(x, 5) OVER w, 0)
        ) / (
          (CASE WHEN lag(x, 0) OVER w IS NULL THEN 0 ELSE CAST('1.0' AS DOUBLE) END) +
          (CASE WHEN lag(x, 1) OVER w IS NULL THEN 0 ELSE CAST('0.7' AS DOUBLE) END) +
          (CASE WHEN lag(x, 2) OVER w IS NULL THEN 0 ELSE CAST('0.48999999999999994' AS DOUBLE) END) +
          (CASE WHEN lag(x, 3) OVER w IS NULL THEN 0 ELSE CAST('0.3429999999999999' AS DOUBLE) END) +
          (CASE WHEN lag(x, 4) OVER w IS NULL THEN 0 ELSE CAST('0.24009999999999995' AS DOUBLE) END) +
          (CASE WHEN lag(x, 5) OVER w IS NULL THEN 0 ELSE CAST('0.16806999999999994' AS DOUBLE) END)
        ), 4) AS ewma
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# cusum_changepoint — max cumulative deviation per event_type
# ---------------------------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detector: per event_type, the daily event
    count's cumulative deviation from its own mean, Sᵢ = Σⱼ≤ᵢ(xⱼ−x̄);
    the reported changepoint is the day of max |Sᵢ| (earliest day on
    ties).  Daily pre-aggregation is the fact-table pass; the mean
    joins back as a 5-row broadcast and the prefix sum runs per type
    over ~2400 day rows.  Integer daily counts keep x̄ the only
    inexact term, so cross-engine drift is ≪ the 2 dp rounding."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    means = daily.groupBy("event_type").agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n_days")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = daily.join(F.broadcast(means), "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.abs(F.sum(F.col("x") - F.col("mu")).over(w)).alias("s"),
    )
    pick = Window.partitionBy("event_type").orderBy(F.desc("s"), "day")
    return (
        cusum.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.round("s", 2).alias("max_abs_cusum"),
            "n_days",
        )
        .orderBy("event_type")
    )


_ORACLE_CUSUM = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
m AS (SELECT event_type, avg(x) AS mu, count(*) AS n_days FROM daily GROUP BY 1),
cusum AS (
  SELECT d.event_type, d.day, m.n_days,
         abs(sum(d.x - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM daily d JOIN m ON d.event_type = m.event_type),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY s DESC, day) AS rn
  FROM cusum)
SELECT event_type, day AS changepoint_day, round(s, 2) AS max_abs_cusum,
       CAST(n_days AS BIGINT) AS n_days
FROM pick WHERE rn = 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kaplan_meier — customer-lifetime survival curve with censoring
# ---------------------------------------------------------------------------


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over customer lifetimes (days between
    first and last order), right-censored when the customer was still
    active in the final 180 days of the dataset.  The estimator
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) is folded as exp(Σ ln(·)) — a
    two-phase parallel prefix sum (global_cumsum) over the
    per-duration event table, which after the per-customer aggregate
    has at most |distinct durations| rows (bounded by the calendar
    span in days, though the prefix is scale-safe regardless).
    Risk set nᵢ = total − (events+censored strictly before tᵢ) is the
    exclusive integer prefix (exact); the double Σ ln prefix drifts
    from a sequential scan by ulps under the two-phase regrouping,
    ≪ the 6-dp rounding.  Output keeps only event times (the curve's
    step points)."""
    orders = load_table(spark, sf_dir, "orders")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_o"), F.max("o_orderdate").alias("last_o")
    )
    end = orders.agg(F.max("o_orderdate").alias("data_end"))
    life = span.join(F.broadcast(end)).select(
        F.datediff("last_o", "first_o").alias("dur"),
        F.when(
            F.col("last_o") < F.col("data_end") - F.expr("INTERVAL 180 DAYS"), 1
        )
        .otherwise(0)
        .alias("observed"),
    )
    per_t = life.groupBy("dur").agg(
        F.sum("observed").alias("d"),
        F.sum(1 - F.col("observed")).alias("c"),
        F.count(F.lit(1)).alias("all_t"),
    )
    total = per_t.agg(F.sum("all_t").alias("n_total"))
    risk = global_cumsum(per_t, ["dur"], ["all_t"]).join(F.broadcast(total)).withColumn(
        "n_risk", F.col("n_total") - (F.col("cum_all_t") - F.col("all_t"))
    )
    logged = risk.withColumn(
        "logterm",
        F.when(
            F.col("d") > 0, F.log(1.0 - F.col("d") / F.col("n_risk"))
        ).otherwise(0.0),
    )
    curve = global_cumsum(logged, ["dur"], ["logterm"]).withColumn(
        "surv", F.exp(F.col("cum_logterm"))
    )
    return (
        curve.where(F.col("d") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            "n_risk",
            F.col("d").alias("events"),
            F.col("c").alias("censored"),
            F.round("surv", 6).alias("survival"),
        )
        .orderBy("duration_days")
    )


_ORACLE_KM = """
WITH span AS (
  SELECT o_custkey, min(o_orderdate) AS first_o, max(o_orderdate) AS last_o
  FROM orders GROUP BY 1),
e AS (SELECT max(o_orderdate) AS data_end FROM orders),
life AS (
  SELECT date_diff('day', first_o, last_o) AS dur,
         CASE WHEN last_o < data_end - INTERVAL 180 DAY THEN 1 ELSE 0 END AS observed
  FROM span, e),
per_t AS (
  SELECT dur, sum(observed) AS d, sum(1 - observed) AS c, count(*) AS all_t
  FROM life GROUP BY 1),
t AS (SELECT sum(all_t) AS n_total FROM per_t),
risk AS (
  SELECT dur, d, c,
         t.n_total - coalesce(sum(all_t) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM per_t, t),
curve AS (
  SELECT dur, d, c, n_risk,
         exp(sum(CASE WHEN d > 0 THEN ln(1.0 - d / n_risk) ELSE 0.0 END)
             OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
  FROM risk)
SELECT CAST(dur AS INTEGER) AS duration_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS events, CAST(c AS BIGINT) AS censored,
       round(surv, 6) AS survival
FROM curve WHERE d > 0 ORDER BY duration_days
"""


QUERIES["ks_two_sample"] = q_ks_two_sample
ORACLES["ks_two_sample"] = _ORACLE_KS
QUERIES["mannwhitney_u"] = q_mannwhitney_u
ORACLES["mannwhitney_u"] = _ORACLE_MWU
QUERIES["ewma_smoothing"] = q_ewma_smoothing
ORACLES["ewma_smoothing"] = _ORACLE_EWMA
QUERIES["cusum_changepoint"] = q_cusum_changepoint
ORACLES["cusum_changepoint"] = _ORACLE_CUSUM
QUERIES["kaplan_meier"] = q_kaplan_meier
ORACLES["kaplan_meier"] = _ORACLE_KM
