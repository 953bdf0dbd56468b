"""Round-7 wave 3 — scaled experimentation analytics:

- ``cuped_adjusted_lift`` — CUPED variance-reduced A/B readout
  (Deng, Xu, Kohavi & Walker, WSDM'13): the pre-period covariate
  regression that modern experimentation platforms run on every
  metric, as two aggregation passes over a per-user frame.
- ``bootstrap_ci_poisson`` — cluster (user-level) Poisson-bootstrap
  confidence interval for the mean event value: the corpus collapses
  to one row per sampling UNIT first, then every (unit, replicate)
  pair draws its multiplicity Poisson(1) from a deterministic hash,
  so ALL B resamples ride ONE pass (explode × map-side-combinable
  aggregate) over the unit frame instead of B shuffled samples —
  the only bootstrap shape that works at 100 TB.

Both follow docs/oracle_determinism.md: money sums go through
DECIMAL(18,2) (events.value carries exactly 2 decimals), ratios of
unordered double moments round at 4 dp (relative add-order drift
~1e-13 cannot reach it), and rank selections carry full tie-broken
orders.  Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES

# ---------------------------------------------------------------------------
# cuped_adjusted_lift — variance-reduced experiment readout
# ---------------------------------------------------------------------------


def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted lift for the md5-parity experiment arms over
    per-user event value: the corpus midpoint splits each user's
    activity into a PRE-period covariate x and a POST-period metric
    y; theta = cov(x, y) / var(x) (pooled across arms, the standard
    estimator), y' = y - theta * (x - mean(x)); the readout reports
    the raw and adjusted lifts plus the realized variance reduction.

    Scale shape: one groupBy(user) pass builds the per-user frame
    (DECIMAL-exact period sums), one 1-row moment aggregate yields
    theta (broadcast back — never a collect), one final aggregate
    computes both arms' means and variances.  Everything is
    map-side-combinable codegen; the per-user frame is the only
    shuffle that scales with data."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # Integer midpoint: DIV keeps both engines on exact integer
    # arithmetic.  (a + b) / 2 with a float cast diverged cross-engine
    # on odd sums — Spark CAST(double AS LONG) truncates 7.5 -> 7 while
    # DuckDB CAST(... AS BIGINT) rounds 7.5 -> 8, flipping the pre/post
    # classification of any event on the boundary second (ADVICE r7).
    bounds = ev.agg(
        F.expr(
            "(unix_timestamp(min(ts)) + unix_timestamp(max(ts))) DIV 2"
        ).alias("mid")
    )
    dec = F.col("value").cast("decimal(18,2)")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.unix_timestamp("ts") < F.col("mid"), dec)),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.unix_timestamp("ts") >= F.col("mid"), dec)),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
            .cast("bigint")
            % 2,
        )
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        "n",
        (F.col("sx") / F.col("n")).alias("mx"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).withColumn(
        "ya", F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))
    )
    g = adj.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.first("theta").alias("theta"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sy_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sy_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("ya"))).alias("sa_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("ya"))).alias("sa_b"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("y").alias("sy"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum("ya").alias("sa"),
        F.count(F.lit(1)).alias("n"),
    )
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    var_a = (F.col("saa") - F.col("sa") * F.col("sa") / F.col("n")) / (
        F.col("n") - 1
    )
    return g.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("theta", 4).alias("theta"),
        F.round(
            F.col("sy_b") / F.col("n_b") - F.col("sy_a") / F.col("n_a"), 4
        ).alias("lift_raw"),
        F.round(
            F.col("sa_b") / F.col("n_b") - F.col("sa_a") / F.col("n_a"), 4
        ).alias("lift_cuped"),
        F.round(F.lit(1.0) - var_a / var_y, 4).alias("var_reduction"),
    )


_ORACLE_CUPED = """
WITH bounds AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
  FROM events),
per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN floor(epoch(ts)) < mid
                  THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS x,
         CAST(coalesce(sum(CASE WHEN floor(epoch(ts)) >= mid
                  THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS arm
  FROM events CROSS JOIN bounds GROUP BY user_id, mid),
mom AS (
  SELECT count(*) AS n, sum(x) / count(*) AS mx,
         (sum(x*y) - sum(x) * sum(y) / count(*))
           / (sum(x*x) - sum(x) * sum(x) / count(*)) AS theta
  FROM per_user),
adj AS (
  SELECT p.*, mom.theta, mom.mx, p.y - mom.theta * (p.x - mom.mx) AS ya
  FROM per_user p CROSS JOIN mom),
g AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         first(theta) AS theta,
         sum(CASE WHEN arm = 0 THEN y END) AS sy_a,
         sum(CASE WHEN arm = 1 THEN y END) AS sy_b,
         sum(CASE WHEN arm = 0 THEN ya END) AS sa_a,
         sum(CASE WHEN arm = 1 THEN ya END) AS sa_b,
         sum(y*y) AS syy, sum(y) AS sy, sum(ya*ya) AS saa, sum(ya) AS sa,
         count(*) AS n
  FROM adj)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(theta, 4) AS theta,
       round(sy_b / n_b - sy_a / n_a, 4) AS lift_raw,
       round(sa_b / n_b - sa_a / n_a, 4) AS lift_cuped,
       round(1.0 - ((saa - sa * sa / n) / (n - 1))
                   / ((syy - sy * sy / n) / (n - 1)), 4) AS var_reduction
FROM g
"""


# ---------------------------------------------------------------------------
# bootstrap_ci_poisson — one-pass bootstrap for the mean event value
# ---------------------------------------------------------------------------

_BOOT_B = 200
# Poisson(1) inverse CDF breakpoints: cumulative e^-1 * sum 1/k!,
# fixed decimal literals so both engines compare the SAME doubles
_POIS_CUM = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _poisson_case(u_expr: str) -> str:
    branches = " ".join(
        f"WHEN {u_expr} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CASE {branches} ELSE 6 END"


def q_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER (user-level) Poisson-bootstrap CI for the mean event
    value: users are the i.i.d. sampling units (events within a user
    are correlated — event-level resampling would understate the
    variance), so the corpus first collapses to one DECIMAL-exact
    (sum, count) row per user, and every (user, replicate) pair
    draws a Poisson(1) multiplicity from a 52-bit md5 uniform (fixed
    inverse-CDF breakpoints, capped at 6).  All {B} replicates ride
    ONE exploded pass over the per-user frame reduced by a
    map-side-combinable aggregate — no per-replicate resampling
    scan, and the B-fanout scales with |users|, not |events|: the
    only bootstrap shape feasible on a 100 TB fact table.  Each
    replicate mean is the ratio Σw·sv / Σw·n; the interval is
    rank-based (5th / 100th / 196th of {B}=200 sorted means, full
    (mean, b) tie order) — no percentile interpolation to diverge
    between engines.""".replace("{B}", str(_BOOT_B))
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dec = F.col("value").cast("decimal(18,2)")
    per_user = ev.groupBy("user_id").agg(
        F.sum(dec).alias("sv"), F.count(F.lit(1)).alias("nv")
    )
    u = (
        f"CAST(conv(substr(md5(concat(CAST(user_id AS STRING), '|',"
        f" CAST(b AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        f" / 4503599627370496.0"
    )
    w = F.expr(_poisson_case(u))
    reps = (
        per_user.select(
            "user_id",
            "sv",
            "nv",
            F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        )
        .withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("nv")).alias("nw"),
            F.sum(F.col("w") * F.col("sv")).alias("svw"),
        )
        .select(
            "b",
            F.round(F.col("svw").cast("double") / F.col("nw"), 6).alias("m"),
        )
    )
    ranked = reps.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "b"))
    )
    pick = ranked.where(F.col("rn").isin(5, 100, 196)).groupBy().agg(
        F.max(F.when(F.col("rn") == 5, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 100, F.col("m"))).alias("boot_med"),
        F.max(F.when(F.col("rn") == 196, F.col("m"))).alias("ci_hi"),
    )
    se = reps.agg(F.round(F.stddev_samp("m"), 4).alias("se_boot"))
    est = per_user.agg(
        F.round(
            F.sum("sv").cast("double") / F.sum("nv"), 6
        ).alias("est")
    )
    return (
        est.crossJoin(F.broadcast(pick))
        .crossJoin(F.broadcast(se))
        .select(
            F.lit(_BOOT_B).cast("int").alias("n_reps"),
            "est",
            "ci_lo",
            "boot_med",
            "ci_hi",
            "se_boot",
        )
    )


_U_SQL = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)),"
    " 1, 13))::BIGINT / 4503599627370496.0"
)

_ORACLE_BOOT = f"""
WITH per_user AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS sv, count(*) AS nv
  FROM events GROUP BY user_id),
fan AS (
  SELECT user_id, sv, nv, b, {_poisson_case(_U_SQL)} AS w
  FROM per_user CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS b)),
reps AS (
  SELECT b, round(CAST(sum(w * sv) AS DOUBLE) / sum(w * nv), 6) AS m
  FROM fan GROUP BY b),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM reps),
pick AS (
  SELECT max(CASE WHEN rn = 5 THEN m END) AS ci_lo,
         max(CASE WHEN rn = 100 THEN m END) AS boot_med,
         max(CASE WHEN rn = 196 THEN m END) AS ci_hi
  FROM ranked),
se AS (SELECT round(stddev_samp(m), 4) AS se_boot FROM reps),
est AS (SELECT round(CAST(sum(sv) AS DOUBLE) / sum(nv), 6) AS est
        FROM per_user)
SELECT {_BOOT_B} AS n_reps, est, ci_lo, boot_med, ci_hi, se_boot
FROM est CROSS JOIN pick CROSS JOIN se
"""


QUERIES["cuped_adjusted_lift"] = q_cuped_adjusted_lift
ORACLES["cuped_adjusted_lift"] = _ORACLE_CUPED
QUERIES["bootstrap_ci_poisson"] = q_bootstrap_ci_poisson
ORACLES["bootstrap_ci_poisson"] = _ORACLE_BOOT


# ---------------------------------------------------------------------------
# calibration_ece — reliability bins + expected calibration error
# ---------------------------------------------------------------------------


def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration audit (reliability diagram + ECE) for a
    deterministic document-quality predictor: p = tok / (tok + 60)
    (a rational logistic surrogate — no libm exp, whose JVM/libc
    1-ulp skew would make bin edges engine-dependent) scored against
    the outcome n_chars > 900.  Ten equal-width probability bins
    report count, mean confidence, observed rate and |gap|; ECE is
    the row-weighted mean |gap| — the standard eval every
    classifier-driven curation filter (quality/PII/decontamination
    gates) should ship with.

    Scale shape: one codegen projection + one 10-key aggregation; the
    ECE join is a broadcast of the 1-row total.  All ratios round at
    4 dp per the determinism contract."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
    scored = docs.select(
        (tok.cast("double") / (tok + F.lit(60)).cast("double")).alias("p"),
        F.when(F.col("n_chars") > 900, 1).otherwise(0).alias("y"),
    ).withColumn("bin", F.least(F.lit(9), F.floor(F.col("p") * 10)).cast("int"))
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum("y").alias("sy"),
    )
    tot = bins.agg(
        F.sum("n").alias("nt"),
        F.sum(
            F.abs(F.col("sp") / F.col("n") - F.col("sy") / F.col("n"))
            * F.col("n")
        ).alias("gap_mass"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sp") / F.col("n"), 4).alias("conf"),
            F.round(F.col("sy") / F.col("n"), 4).alias("obs"),
            F.round(
                F.abs(F.col("sp") / F.col("n") - F.col("sy") / F.col("n")), 4
            ).alias("gap"),
            F.round(F.col("gap_mass") / F.col("nt"), 4).alias("ece"),
        )
        .orderBy("bin")
    )


_ORACLE_ECE = """
WITH scored AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)
           / (len(list_filter(string_split(text, ' '), x -> x <> '')) + 60) AS p,
         CASE WHEN n_chars > 900 THEN 1 ELSE 0 END AS y
  FROM documents),
b AS (SELECT least(9, CAST(floor(p * 10) AS INT)) AS bin, p, y FROM scored),
bins AS (SELECT bin, count(*) AS n, sum(p) AS sp, sum(y) AS sy
         FROM b GROUP BY bin),
tot AS (SELECT sum(n) AS nt,
               sum(abs(sp / n - CAST(sy AS DOUBLE) / n) * n) AS gap_mass
        FROM bins)
SELECT bin, CAST(n AS BIGINT) AS n,
       round(sp / n, 4) AS conf,
       round(CAST(sy AS DOUBLE) / n, 4) AS obs,
       round(abs(sp / n - CAST(sy AS DOUBLE) / n), 4) AS gap,
       round(gap_mass / nt, 4) AS ece
FROM bins CROSS JOIN tot ORDER BY bin
"""


# ---------------------------------------------------------------------------
# k_anonymity_audit — quasi-identifier equivalence-class risk profile
# ---------------------------------------------------------------------------

_K_THRESHOLD = 5


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the events table: the quasi-identifier
    is (event_type, calendar date, value band of 50) — the release
    shape of an "anonymized" activity log — and every equivalence
    class smaller than k=5 is a re-identification risk.  Per
    event_type: class count, small-class count, rows at risk and the
    minimum k.  The governance pass a 100 TB data release needs
    before the privacy review, and it is two integer aggregations:
    one shuffle on the QI, one rollup on its first component —
    all-integer output, zero float surface."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") / 50).cast("long").alias("band"),
    )
    classes = qi.groupBy("event_type", "d", "band").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        classes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("k") < _K_THRESHOLD, 1).otherwise(0)).alias(
                "n_small_classes"
            ),
            F.sum(
                F.when(F.col("k") < _K_THRESHOLD, F.col("k")).otherwise(0)
            ).alias("rows_at_risk"),
            F.min("k").alias("min_k"),
        )
        .orderBy("event_type")
    )


_ORACLE_KANON = f"""
WITH classes AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(floor(value / 50) AS BIGINT) AS band, count(*) AS k
  FROM events GROUP BY 1, 2, 3)
SELECT event_type,
       count(*) AS n_classes,
       CAST(sum(CASE WHEN k < {_K_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(sum(CASE WHEN k < {_K_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(min(k) AS BIGINT) AS min_k
FROM classes GROUP BY 1 ORDER BY 1
"""


QUERIES["calibration_ece"] = q_calibration_ece
ORACLES["calibration_ece"] = _ORACLE_ECE
QUERIES["k_anonymity_audit"] = q_k_anonymity_audit
ORACLES["k_anonymity_audit"] = _ORACLE_KANON


# ---------------------------------------------------------------------------
# bfs_hop_histogram — multi-source shortest hops on the supplier↔part graph
# ---------------------------------------------------------------------------

_BFS_HOPS = 4


def _bfs_oracle_round(r: int) -> str:
    return (
        f"d{r} AS (SELECT ea.dst AS node, min(d{r-1}.d + ea.w) AS d\n"
        f"  FROM ea JOIN d{r-1} ON ea.src = d{r-1}.node GROUP BY 1)"
    )


def q_bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram from suppliers 1-3 over the undirected
    supplier↔part graph (pagerank_bipartite's edge set): how much of
    the catalog is within 4 hops of the seed suppliers, split by node
    type — the reachability profile supply-chain blast-radius and
    recommendation-coverage analyses start from, and the fourth
    iterative-graph family (operators/graph_paths.py).

    Scale shape: edges persist ONCE in the regime-appropriate layout;
    at this |V| the distance frame rides a broadcast, so each of the
    4 Bellman-Ford rounds is a map-side join + one layout-reusing
    min-aggregate with zero shuffles (weight-0 self-edges carry the
    keep-current-distance term through the SAME join).  All-integer
    output."""
    from ..operators.graph_paths import multi_source_hops

    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 1000000000000).alias("dst"),
    ).distinct()
    edges = sp.union(sp.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sources = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 3)
        .select(F.col("s_suppkey").alias("node"))
    )
    hops = multi_source_hops(edges, sources, max_hops=_BFS_HOPS)
    return (
        hops.select(
            "hops",
            F.when(F.col("node") > 1000000000000, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
        )
        .groupBy("hops", "node_type")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hops", "node_type")
    )


_ORACLE_BFS = (
    """
WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000000000 AS p FROM lineitem),
e AS (SELECT s AS src, p AS dst, 1 AS w FROM sp
      UNION ALL SELECT p AS src, s AS dst, 1 AS w FROM sp),
srcs AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey <= 3),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT node FROM srcs),
ea AS (SELECT src, dst, w FROM e
       UNION ALL SELECT node AS src, node AS dst, 0 AS w FROM nodes),
d0 AS (SELECT node, 0 AS d FROM srcs),
"""
    + ",\n".join(_bfs_oracle_round(r) for r in range(1, _BFS_HOPS + 1))
    + f"""
SELECT d AS hops,
       CASE WHEN node > 1000000000000 THEN 'part' ELSE 'supplier' END AS node_type,
       count(*) AS n_nodes
FROM d{_BFS_HOPS} GROUP BY 1, 2 ORDER BY 1, 2
"""
)


QUERIES["bfs_hop_histogram"] = q_bfs_hop_histogram
ORACLES["bfs_hop_histogram"] = _ORACLE_BFS


# ---------------------------------------------------------------------------
# conformal_interval — split-conformal coverage audit, all-integer
# ---------------------------------------------------------------------------

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1 -> 90% target


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction audit (Vovk et al.; Angelopoulos &
    Bates 2021 tutorial — public literature) for the fixed heuristic
    token-count predictor yhat = n_chars DIV 6: documents split into
    calibration/test folds by md5 parity, the conformal quantile q is
    the ceil((n_cal+1)*(1-alpha))-th smallest ABSOLUTE residual on
    the calibration fold (rank-based — finite-sample-valid and
    integer-exact here, since both y and yhat are integers), and the
    audit reports the realized test coverage of |y - yhat| <= q in
    integer basis points.  The distribution-free interval audit any
    learned curation scorer needs before its threshold ships.

    Scale shape: one codegen projection, one calibration sort bounded
    by ONE rank filter (window over the calibration fold only), one
    broadcast of the 1-row q, one test-fold aggregate.  All-integer
    output: zero float surface."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
    base = docs.select(
        tok.cast("long").alias("y"),
        (F.col("n_chars") / 6).cast("long").alias("yhat"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("bigint")
            % 2
        ).alias("fold"),  # 0 = calibration, 1 = test
    ).withColumn("r", F.abs(F.col("y") - F.col("yhat")))
    cal = base.where(F.col("fold") == 0)
    n_cal = cal.groupBy().agg(F.count(F.lit(1)).alias("n_cal"))
    # rank = ceil((n_cal+1)*(1-alpha)) clamped to n_cal
    k = F.least(
        F.col("n_cal"),
        F.ceil(
            (F.col("n_cal") + 1)
            * F.lit(_CONF_ALPHA_DEN - _CONF_ALPHA_NUM)
            / F.lit(_CONF_ALPHA_DEN)
        ).cast("long"),
    ).alias("k")
    ranked = (
        cal.select("r")
        .withColumn("rn", F.row_number().over(Window.orderBy("r")))
        .crossJoin(F.broadcast(n_cal.select("n_cal", k)))
        .where(F.col("rn") == F.col("k"))
        .select("n_cal", F.col("r").alias("q"))
    )
    test = base.where(F.col("fold") == 1)
    return (
        test.crossJoin(F.broadcast(ranked))
        .groupBy("n_cal", "q")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
        .select(
            "n_cal",
            "n_test",
            "q",
            "n_covered",
            F.expr("CAST((10000 * n_covered) DIV n_test AS BIGINT)").alias(
                "coverage_bp"
            ),
        )
    )


_ORACLE_CONFORMAL = f"""
WITH base AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS y,
         CAST(floor(n_chars / 6) AS BIGINT) AS yhat,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS fold
  FROM documents),
r AS (SELECT fold, abs(y - yhat) AS r FROM base),
cal AS (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM r WHERE fold = 0),
nc AS (SELECT count(*) AS n_cal FROM cal),
qq AS (SELECT n_cal, r AS q FROM cal CROSS JOIN nc
       WHERE rn = least(n_cal, CAST(ceil((n_cal + 1)
             * {_CONF_ALPHA_DEN - _CONF_ALPHA_NUM}.0 / {_CONF_ALPHA_DEN}) AS BIGINT))),
t AS (SELECT count(*) AS n_test,
             sum(CASE WHEN r.r <= qq.q THEN 1 ELSE 0 END) AS n_covered,
             first(qq.n_cal) AS n_cal, first(qq.q) AS q
      FROM r CROSS JOIN qq WHERE fold = 1)
SELECT n_cal, CAST(n_test AS BIGINT) AS n_test, q,
       CAST(n_covered AS BIGINT) AS n_covered,
       CAST((10000 * n_covered) // n_test AS BIGINT) AS coverage_bp
FROM t
"""


QUERIES["conformal_interval"] = q_conformal_interval
ORACLES["conformal_interval"] = _ORACLE_CONFORMAL
