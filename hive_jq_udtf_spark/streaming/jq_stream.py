"""Structured Streaming integration (SURVEY §7 step 9).

The jq operator is stateless row-at-a-time (reference: no state
across rows, close() empty — JsonQueryUDTF.java:74-107,115), so
``jq_explode`` lifts unchanged onto streaming DataFrames; Spark
handles incremental execution.  This module adds the canonical
streaming shapes around it:

- jq_stream_explode: identical API to jq_explode, asserted
  streaming-safe (native tier preferred — pure expressions are
  always streaming-compatible).
- windowed_event_counts: watermark + tumbling-window aggregation
  over jq-extracted fields (late data handled by the watermark).
- sessionized_counts: session_window variant.
- run_file_stream_once: availableNow file-source → memory-sink
  harness used by tests (deterministic, no timers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..udtf import jq_explode


def jq_stream_explode(
    stream_df: DataFrame, column: str, program: str, *decls: str, **kw
) -> DataFrame:
    if not stream_df.isStreaming:
        raise ValueError("jq_stream_explode expects a streaming DataFrame")
    return jq_explode(stream_df, column, program, *decls, **kw)


def windowed_event_counts(
    events_stream: DataFrame,
    program: str = "{k: .k}",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    json_col: str = "props",
) -> DataFrame:
    """Tumbling-window aggregate of a jq-extracted metric with a
    watermark for late data."""
    x = jq_stream_explode(events_stream, json_col, program, "k:int")
    return (
        x.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("sum_k"),
        )
    )


def sessionized_counts(
    events_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Session-window counts per user (session_window native op)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("user_id"),
            F.col("n_events"),
        )
    )


def run_file_stream_once(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    transform,
    out_table: str = "stream_out",
    output_mode: str = "append",
) -> DataFrame:
    """Deterministic streaming harness: json-lines file source →
    transform → memory sink, trigger availableNow, await finish."""
    src = spark.readStream.schema(schema).json(source_dir)
    out = transform(src)
    q = (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)
