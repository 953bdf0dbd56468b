"""Canonical loaders for the driver's TPC-H-ish testdata tables.

The parquet files carry INT64 TIMESTAMP(NANOS) columns, which Spark
rejects by default (PARQUET_TYPE_ILLEGAL).  We read them with
``spark.sql.legacy.parquet.nanosAsLong`` and convert nanos → proper
TimestampType (microsecond precision, matching DuckDB's reading of
the same files so oracle comparisons line up).

At 100 TB these loaders stay scan-friendly: conversion is a cheap
projected expression (no shuffle, no UDF), pushdown/pruning still
reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# timestamp(nanos) columns per table — converted to TimestampType
_TS_COLUMNS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def enable_nanos(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    enable_nanos(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLUMNS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integral `div`, NOT `/1000` + cast: float division loses
            # precision at ~1.7e18 ns (doubles carry 53 bits) and lands
            # 1µs off DuckDB's exact nanos→micros truncation
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t + suffix)
