"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke: rows > 0)
queries()      — name → callable(spark, sf_dir) → DataFrame
oracle_sql()   — name → equivalent DuckDB SQL over the same tables

Implementation lives in hive_jq_udtf_spark/ (SURVEY §2 operator
inventory; §7 build plan).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: jq-UDTF lateral explode of events.props + aggregate
    (the README.md:121 lateral-view shape on the driver's testdata)."""
    from hive_jq_udtf_spark.plans.queries import q_jq_extract_agg

    return q_jq_extract_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hive_jq_udtf_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hive_jq_udtf_spark.plans.queries import ORACLES

    return dict(ORACLES)
