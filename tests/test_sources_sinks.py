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


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """write_bucketed pre-shuffles on the key: joining two tables
    bucketed the same way must plan with NO Exchange on either side
    (the co-located-join strategy for repeatedly-joined fact tables)."""
    import uuid

    from hive_jq_udtf_spark.sources.jsonl import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    a = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn("va", F.col("k") * 2)
    b = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn("vb", F.col("k") + 1)
    ta, tb = f"ta_{uuid.uuid4().hex[:8]}", f"tb_{uuid.uuid4().hex[:8]}"
    try:
        write_bucketed(a, ta, ["k"], num_buckets=8, sort_by=["k"])
        write_bucketed(b, tb, ["k"], num_buckets=8, sort_by=["k"])
        j = spark.table(ta).join(spark.table(tb), on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == 10000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
