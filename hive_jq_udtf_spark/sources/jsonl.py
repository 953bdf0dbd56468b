"""Raw-JSON sources and partitioned sinks.

The reference's primary input shape is a table column of raw JSON
strings fed to the jq UDTF (README.md:115-117 creates a Hive table
with a STRING json column).  These helpers reproduce that shape from
files, Spark-first:

- read_jsonl_raw: each line of a .jsonl/.json/.txt file becomes one
  row with a single ``json`` string column — NO schema inference, no
  parse at scan time.  This is the right source for the jq tier: the
  jq program (not the reader) decides structure, and corrupt lines
  flow into the $error channel instead of failing the scan.
- read_json_typed: conventional schema'd read (spark.read.json) for
  when the structure is known — stays fully native/codegen.
- write_partitioned / write_bucketed: the standard large-scale sink
  shapes (hive-style partition pruning; pre-shuffled bucketed tables
  for shuffle-free joins on the bucket key).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_jsonl_raw(
    spark: SparkSession, path: str, column: str = "json"
) -> DataFrame:
    """One row per input line, single raw string column.

    Scale notes: text scan is splittable per line for uncompressed /
    bzip2 files; with gzip each file is one task — shard upstream.
    ``spark.sql.files.maxPartitionBytes`` governs split sizing."""
    return spark.read.text(path).withColumnRenamed("value", column)


def read_json_typed(
    spark: SparkSession, path: str, schema: Optional[str] = None
) -> DataFrame:
    """Schema'd JSON read; pass an explicit DDL schema at scale —
    inference is a full extra pass over the data."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Hive-style partitioned parquet sink.

    ``maxRecordsPerFile`` caps file size without an extra
    repartition job; readers get partition pruning on
    ``partition_by`` for free.  Choose low-cardinality partition
    columns (date, source) — high-cardinality keys create a
    small-files explosion."""
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 128,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles on ``bucket_by`` so
    subsequent equi-joins / aggregations on those keys are
    shuffle-free (Catalyst recognizes the bucketing).  This is the
    co-located-join strategy for repeatedly-joined 100 TB fact
    tables."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)
