"""Round-5 continuation wave D: jq datetime builtins exercised
end-to-end through the UDTF (reference parity: jackson-jq exposes the
strptime/mktime/todate family the same way — SURVEY §2.2 J26), plus
three robust/audit statistics: median-absolute-deviation outlier
detection, a Benford's-law first-digit audit, and Theil–Sen robust
trend estimation.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..udtf import jq_explode
from .queries import ORACLES, QUERIES


# ---------------------------------------------------------------------------
# jq_datetime_ops — strptime → mktime → todate through the UDTF
# ---------------------------------------------------------------------------


def q_jq_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jq time family end-to-end: each event's timestamp is
    serialized into the JSON payload, then the jq program parses it
    back (strptime), converts to epoch seconds (mktime), shifts one
    day, and re-renders ISO-8601 (todate).  Verifies the UTC
    broken-down-time semantics of the evaluator's J26 builtins
    (jqlib/evaluator.py:2961-2992) against DuckDB's epoch()/strftime
    on the raw column.  The UDTF stage is Arrow-batched; the
    aggregate collapses to one row."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("d"),
                F.col("event_id").alias("id"),
            )
        ),
    )
    x = jq_explode(
        j,
        "payload",
        '(.d | strptime("%Y-%m-%dT%H:%M:%S") | mktime) as $e | '
        '{e: $e, nd: (($e + 86400) | todate), id: .id}',
        "e:bigint",
        "nd:string",
        "id:bigint",
        native="never",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return x.agg(
        F.min("e").alias("min_epoch"),
        F.max("e").alias("max_epoch"),
        F.max("nd").alias("max_next_day"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id")).alias("id_sum"),
    )


_ORACLE_JQ_DATETIME = """
SELECT CAST(floor(min(epoch(ts))) AS BIGINT) AS min_epoch,
       CAST(floor(max(epoch(ts))) AS BIGINT) AS max_epoch,
       max(strftime(ts + INTERVAL 1 DAY, '%Y-%m-%dT%H:%M:%SZ')) AS max_next_day,
       count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events
"""


# ---------------------------------------------------------------------------
# mad_outliers — median-absolute-deviation outlier counts
# ---------------------------------------------------------------------------


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: median and MAD of the
    value column, then the count of points beyond the standard
    3·1.4826·MAD fence (1.4826 makes MAD a consistent σ estimator
    under normality — the robust-statistics textbook constant).  Two
    grouped exact-percentile passes and one broadcast join-back; the
    medians are per-group sort-aggregates, the scale path being the
    repo's t-digest/GK sketches when exactness can be relaxed."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    fenced = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        fenced.groupBy("event_type")
        .agg(
            F.round(F.first("med"), 4).alias("median"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


_ORACLE_MAD = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type),
mad AS (
  SELECT event_type, any_value(med) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY 1)
SELECT d.event_type, round(any_value(m.med), 4) AS median,
       round(any_value(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       count(*) AS n
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# benford_deviation — first-significant-digit audit
# ---------------------------------------------------------------------------


def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the observed first
    significant digit distribution vs the expected log₁₀(1 + 1/d),
    with each digit's χ² contribution.  One grouped count over the
    fact table (9 output rows); a large total χ² flags fabricated or
    truncated monetary data — the classic forensic data-quality
    screen.  Synthetic uniform-ish prices will NOT follow Benford;
    the point is the measurement, which the oracle pins exactly."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    counts = orders.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("observed")
    )
    total = counts.agg(F.sum("observed").alias("n"))
    expected = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "digit",
            "observed",
            F.round(expected, 2).alias("expected"),
            F.round(
                F.pow(F.col("observed") - expected, F.lit(2.0)) / expected, 4
            ).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


_ORACLE_BENFORD = """
WITH c AS (
  SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice)))) AS INTEGER)
           AS digit,
         count(*) AS observed
  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
t AS (SELECT sum(observed) AS n FROM c)
SELECT digit, observed,
       round(t.n * log10(1.0 + 1.0 / digit), 2) AS expected,
       round(pow(observed - t.n * log10(1.0 + 1.0 / digit), 2)
             / (t.n * log10(1.0 + 1.0 / digit)), 4) AS chi2_contrib
FROM c, t ORDER BY digit
"""


# ---------------------------------------------------------------------------
# theil_sen_trend — robust slope over daily event counts
# ---------------------------------------------------------------------------


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event_type: the median of all
    pairwise slopes between daily count points, with the matching
    median intercept.  Immune to ~29 % outlier contamination where
    OLS (grouped_regression) is not.  The pairwise step is quadratic
    in DAYS (≈30 in this dataset), not rows — the daily
    pre-aggregation is the only fact-table pass, so the O(T²) slope
    set stays a few hundred rows per type at any data scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    wi = Window.partitionBy("event_type").orderBy("day")
    pts = daily.select(
        "event_type", F.row_number().over(wi).cast("double").alias("x"), "y"
    )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.x") < F.col("b.x")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("m"),
        )
    )
    m = slopes.groupBy("event_type").agg(
        F.expr("percentile(m, 0.5)").alias("slope")
    )
    return (
        pts.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.first("slope"), 6).alias("slope"),
            F.round(
                F.expr("percentile(y - slope * x, 0.5)"), 4
            ).alias("intercept"),
        )
        .orderBy("event_type")
    )


_ORACLE_THEIL_SEN = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2),
pts AS (
  SELECT event_type, CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
         AS DOUBLE) AS x, y
  FROM daily),
slopes AS (
  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS m
  FROM pts a JOIN pts b ON a.event_type = b.event_type AND a.x < b.x),
sl AS (SELECT event_type, quantile_cont(m, 0.5) AS slope FROM slopes GROUP BY 1)
SELECT p.event_type, count(*) AS n_days,
       round(any_value(s.slope), 6) AS slope,
       round(quantile_cont(p.y - s.slope * p.x, 0.5), 4) AS intercept
FROM pts p JOIN sl s ON p.event_type = s.event_type
GROUP BY 1 ORDER BY 1
"""


QUERIES["jq_datetime_ops"] = q_jq_datetime_ops
ORACLES["jq_datetime_ops"] = _ORACLE_JQ_DATETIME
QUERIES["mad_outliers"] = q_mad_outliers
ORACLES["mad_outliers"] = _ORACLE_MAD
QUERIES["benford_deviation"] = q_benford_deviation
ORACLES["benford_deviation"] = _ORACLE_BENFORD
QUERIES["theil_sen_trend"] = q_theil_sen_trend
ORACLES["theil_sen_trend"] = _ORACLE_THEIL_SEN


# ---------------------------------------------------------------------------
# jq_sql_helpers — IN / pick / trim through the UDTF
# ---------------------------------------------------------------------------


def q_jq_sql_helpers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-style jq helpers end-to-end: IN(...) membership on the
    event type, pick(...) projection re-serialized with tojson, and
    the 1.7 trim family on padded strings — all inside one UDTF pass,
    aggregated to a single row the DuckDB oracle reproduces with
    plain SQL (IN list, json_object, trim)."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("t"),
                F.concat(F.lit("  "), F.col("event_type"), F.lit(" \t ")).alias("pad"),
            )
        ),
    )
    x = jq_explode(
        j,
        "payload",
        '{id: .id, hot: (.t | IN("view", "click")),'
        ' picked: (pick(.id) | tojson), tt: (.pad | trim)}',
        "id:bigint",
        "hot:boolean",
        "picked:string",
        "tt:string",
        native="never",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("hot"), 1).otherwise(0)).alias("n_hot"),
        F.sum(F.when(F.col("hot"), F.col("id"))).alias("hot_id_sum"),
        F.max("picked").alias("max_picked"),
        F.countDistinct("tt").alias("n_types_trimmed"),
        F.max("tt").alias("max_trimmed"),
    )


_ORACLE_JQ_SQL_HELPERS = """
SELECT count(*) AS n,
       CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hot,
       CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN event_id END) AS BIGINT)
         AS hot_id_sum,
       max('{"id":' || CAST(event_id AS VARCHAR) || '}') AS max_picked,
       count(DISTINCT event_type) AS n_types_trimmed,
       max(event_type) AS max_trimmed
FROM events
"""


QUERIES["jq_sql_helpers"] = q_jq_sql_helpers
ORACLES["jq_sql_helpers"] = _ORACLE_JQ_SQL_HELPERS
