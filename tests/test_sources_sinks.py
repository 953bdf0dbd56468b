"""Sources/sinks: raw-JSONL → jq UDTF round trip, partitioned and
bucketed sinks (SURVEY §2.3 scan/sink rows)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from hive_jq_udtf_spark.sources.jsonl import (
    read_json_typed,
    read_jsonl_raw,
    write_partitioned,
)
from hive_jq_udtf_spark.udtf import jq_explode


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"k": 1, "tags": ["a", "b"]}\n'
        '{"k": 2, "tags": []}\n'
        "this is not json\n"
        '{"k": 3, "tags": ["c"]}\n'
    )
    return str(p)


def test_jsonl_raw_to_jq_with_error_channel(spark, jsonl_file):
    raw = read_jsonl_raw(spark, jsonl_file)
    assert raw.columns == ["json"]
    # corrupt line routed through $error → substitute -1 (reference
    # README.md:145-160 substitute-on-error idiom)
    out = jq_explode(
        raw,
        "json",
        'if $error == null then {k: .k} else {k: -1} end',
        "k:int",
        native="never",
    )
    assert sorted(r.k for r in out.collect()) == [-1, 1, 2, 3]


def test_jsonl_raw_fanout_tags(spark, jsonl_file):
    raw = read_jsonl_raw(spark, jsonl_file)
    out = jq_explode(
        raw, "json", 'if $error == null then {tag: .tags[]} else empty end', "tag:string",
        native="never",
    )
    assert sorted(r.tag for r in out.collect()) == ["a", "b", "c"]


def test_read_json_typed_with_schema(spark, jsonl_file):
    df = read_json_typed(spark, jsonl_file, "k int, tags array<string>")
    rows = df.where(F.col("k").isNotNull()).collect()
    assert sorted(r.k for r in rows) == [1, 2, 3]


def test_write_partitioned_round_trip_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, part string, v long"
    )
    out = str(tmp_path / "pq")
    write_partitioned(df, out, partition_by=["part"])
    assert any(d.startswith("part=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.where(F.col("part") == "a").count() == 2
    # partition pruning visible in the plan
    plan = back.where(F.col("part") == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "part#" in plan
