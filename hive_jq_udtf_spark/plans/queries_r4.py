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
