"""Isolated A/B for the r13 value-precise duplicate-key substitution
(VERDICT r12 #4 done-criteria: native-family medians hold ±10%).

Times three expression variants over the SAME 1M-row corpus (70%
clean docs, 30% arrays-of-objects docs that trip the over-approximate
suspect gate without being true duplicates):

  raw    — plain get_json_object (no dup machinery; the floor)
  r12    — the old substitution (suspect scalars substitute, suspect
           composites keep raw text: no extra parse)
  r13    — `_dup_fixed_raw` (value-precise: suspect composites pay
           try_parse_json(raw) + canonical-render compare)

Prints per-variant wall seconds (median of 3 fresh plans) and the
per-row delta of r13 vs r12 — the marginal cost of the closure on the
suspect-heavy worst case.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

N = 1_000_000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hive_jq_udtf_spark.native import _dup_fixed_raw, _dup_suspect

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.variant.allowDuplicateKeys", "true")

    # 30% suspect (repeated "u" key across array elements — the
    # arrays-of-objects false-positive class), 70% clean
    df = (
        spark.range(N)
        .select(
            F.when(
                F.col("id") % 10 < 3,
                F.concat(
                    F.lit('{"a": {"k": '),
                    (F.col("id") % 97).cast("string"),
                    F.lit(', "j": 1}, "items": [{"u": 1}, {"u": 2}]}'),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit('{"a": {"k": '),
                    (F.col("id") % 97).cast("string"),
                    F.lit(', "j": 1}, "x": 5}'),
                )
            )
            .alias("j")
        )
        .persist()
    )
    df.count()

    jp = "$.a"
    col = F.col("j")

    def variant_cols(name):
        raw = F.get_json_object(col, jp)
        v = F.try_variant_get(F.try_parse_json(col), jp, "variant")
        if name == "raw":
            return raw
        if name == "r12":
            vt = F.schema_of_variant(v)
            iscomp = vt.startswith("ARRAY") | vt.startswith("OBJECT")
            return F.when(~_dup_suspect(col) | iscomp, raw).otherwise(
                v.try_cast("string")
            )
        return _dup_fixed_raw(col, raw, v)

    def time_once(name):
        t0 = time.time()
        out = df.select(
            F.sum(F.length(variant_cols(name))).alias("s")
        ).collect()[0].s
        return time.time() - t0, out

    # The bench host stalls intermittently (probe-gate territory), so
    # the estimator is stall-robust: variants INTERLEAVE round-robin
    # (a stall window hits all three, not one) and the reported number
    # is the MIN across 7 trials — the least contaminated fully-warm
    # sample, the same estimator bench.py's quarantine keeps.
    names = ("raw", "r12", "r13")
    checksum = {}
    for name in names:
        _, checksum[name] = time_once(name)  # codegen warm + checksum
    assert len(set(checksum.values())) == 1, checksum
    trials: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(7):
        for name in names:
            trials[name].append(time_once(name)[0])
    results = {}
    for name in names:
        ts = sorted(trials[name])
        results[name] = ts[0]
        print(
            f"{name}: min {ts[0]:.3f}s median {ts[len(ts)//2]:.3f}s "
            f"(trials {[round(t, 3) for t in ts]})"
        )
    d = (results["r13"] - results["r12"]) / N * 1e9
    print(f"r13 vs r12 marginal (min-based): {d:+.1f} ns/row over {N} rows (30% suspect)")


if __name__ == "__main__":
    main()
