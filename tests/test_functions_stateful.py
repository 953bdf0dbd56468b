"""Scalar jq UDF family + stateful streaming operator."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_fns(spark):
    from hive_jq_udtf_spark.functions.jq_functions import register_functions

    register_functions(spark)
    return spark


def test_jq_first_sql(spark_fns):
    rows = spark_fns.sql(
        """SELECT jq_first('{"a": {"b": 5}}', '.a.b') AS v,
                  jq_first('{"a": 1}', '.missing') AS m,
                  jq_first('{"a": [1,2]}', '.a') AS arr"""
    ).collect()[0]
    assert rows.v == "5"
    assert rows.m is None  # jq null and empty stream both map to SQL NULL
    assert rows.arr == "[1,2]"


def test_jq_all_and_matches(spark_fns):
    r = spark_fns.sql(
        """SELECT jq_all('[1,2,3]', '.[] | select(. > 1)') AS xs,
                  jq_matches('{"k": 60}', '.k > 50') AS hit,
                  jq_matches('{"k": 10}', '.k > 50') AS miss,
                  jq_matches('garbage', '.k') AS broken"""
    ).collect()[0]
    assert r.xs == ["2", "3"]
    assert r.hit is True
    assert r.miss is False
    assert r.broken is False


def test_jq_typed_extracts(spark_fns):
    r = spark_fns.sql(
        """SELECT jq_long('{"k": "123"}', '.k') AS l,
                  jq_double('{"k": "1.5"}', '.k') AS d,
                  jq_string('{"k": {"x": 1}}', '.k') AS s"""
    ).collect()[0]
    assert r.l == 123
    assert r.d == 1.5
    assert r.s == '{"x":1}'


def test_jq_functions_on_events(spark_fns, sf_dir):
    from hive_jq_udtf_spark.sources.tables import load_table

    events = load_table(spark_fns, sf_dir, "events")
    from hive_jq_udtf_spark.functions.jq_functions import jq_long

    out = events.select(jq_long("props", F.lit(".k")).alias("k")).agg(
        F.count("k").alias("n"), F.min("k").alias("mn")
    ).collect()[0]
    assert out.n == 1000
    assert out.mn >= 0


def test_stateful_running_totals(spark, tmp_path):
    from hive_jq_udtf_spark.streaming.jq_stream import run_file_stream_once
    from hive_jq_udtf_spark.streaming.stateful import running_user_totals

    p = tmp_path / "ev"
    p.mkdir()
    with open(p / "a.jsonl", "w") as f:
        for i in range(60):
            f.write(
                json.dumps(
                    {
                        "user_id": i % 3,
                        "ts": "2026-01-01T00:00:00Z",
                        "props": json.dumps({"k": i}),
                    }
                )
                + "\n"
            )
    out = run_file_stream_once(
        spark,
        str(p),
        "user_id long, ts timestamp, props string",
        lambda src: running_user_totals(src),
        out_table="stateful_out",
        output_mode="update",
    )
    rows = {r.user_id: (r.n_events, r.sum_k) for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0][0] == 20
    assert sum(v[1] for v in rows.values()) == sum(range(60))


def test_stateful_timeout_evicts_state(spark, tmp_path):
    """ProcessingTimeTimeout must EVICT state (ADVICE r1 medium): on
    timeout the key's state is removed and nothing is re-emitted, so a
    key that reappears later restarts its totals from zero."""
    import time

    from hive_jq_udtf_spark.streaming.stateful import running_user_totals

    p = tmp_path / "ev2"
    p.mkdir()

    def write(name, uid, ks):
        with open(p / name, "w") as f:
            for k in ks:
                f.write(
                    json.dumps(
                        {
                            "user_id": uid,
                            "ts": "2026-01-01T00:00:00Z",
                            "props": json.dumps({"k": k}),
                        }
                    )
                    + "\n"
                )

    write("a.jsonl", 0, [1, 2])
    src = spark.readStream.schema("user_id long, ts timestamp, props string").json(str(p))
    out = running_user_totals(src, timeout_ms=300)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_timeout_out")
        .outputMode("update")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows():
            return spark.sql("SELECT * FROM stateful_timeout_out").collect()

        while time.time() < deadline and not any(r.user_id == 0 for r in rows()):
            time.sleep(0.2)
        time.sleep(1.5)  # let the processing-time timeout expire + fire
        write("b.jsonl", 1, [5])  # unrelated key keeps batches flowing
        while time.time() < deadline and not any(r.user_id == 1 for r in rows()):
            time.sleep(0.2)
        time.sleep(0.5)
        write("c.jsonl", 0, [7])  # key 0 returns after eviction
        while time.time() < deadline and not any(
            r.user_id == 0 and r.n_events == 1 for r in rows()
        ):
            time.sleep(0.2)
        final = rows()
    finally:
        q.stop()
    k0 = [(r.n_events, r.sum_k) for r in final if r.user_id == 0]
    assert (2, 3.0) in k0  # pre-timeout totals
    # restart from zero proves the state was removed on timeout
    assert (1, 7.0) in k0, f"state not evicted on timeout: {k0}"
    # eviction must not re-emit the stale totals every interval
    assert k0.count((2, 3.0)) == 1, f"stale duplicate emissions: {k0}"
