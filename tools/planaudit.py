"""Plan audit for the optimization rounds (guide §1/§7.2).

For every registered query: build the DataFrame against a bench-like
session (staged multi-row-group parquet, same confs as bench.py),
capture ``explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt,
and write a one-line-per-query summary JSON with the plan-shape
signals the optimization guide says to look at:

  - number of Exchange nodes (shuffles) and their partitioning
  - Python boundary nodes (BatchEvalPython / ArrowEvalPython /
    MapInArrow / MapInPandas / FlatMapGroupsInPandas)
  - join strategies (BroadcastHashJoin / SortMergeJoin /
    ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct)
  - whether the parquet scans carry PushedFilters and how wide the
    ReadSchema is
  - plan-BUILD wall time (python query-construction + analysis) vs
    a separately timed noop execution (--exec), so plan-bound and
    data-bound queries are distinguishable (guide §1.1).

Iterative queries that run driver-side loops execute work during
fn() itself; their captured plan is the final frame only and
build_sec includes the loop — flagged in the summary as
``driver_loop`` when build_sec > 1s and the plan is an RDD scan.

Usage:
  python tools/planaudit.py --tag r14 --suffix before [--exec]
      [--sf DIR] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_session(sf_dir: str):
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    local_dir = tempfile.mkdtemp(prefix="planaudit_local_", dir=shm)
    import atexit

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("planaudit")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same staging as bench.py: multi-row-group files so scans split
    staged = tempfile.mkdtemp(prefix="planaudit_staged_", dir=shm)
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    import pyarrow.parquet as pq

    from hive_jq_udtf_spark.sources.tables import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(tbl, f"{staged}/{t}.parquet", row_group_size=32768)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    return spark, staged


def explain_str(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def summarize(plan: str) -> dict:
    import re

    lines = plan.splitlines()
    counts = {
        "exchange": 0,
        "broadcast_exchange": 0,
        "python_nodes": 0,
        "bhj": 0,
        "smj": 0,
        "shj": 0,
        "bnlj": 0,
        "cartesian": 0,
        "sort": 0,
        "window": 0,
        "scans": 0,
    }
    python_kinds = set()
    for ln in lines:
        # count operator occurrences from the numbered tree section
        if re.search(r"\bBroadcastExchange\b", ln):
            counts["broadcast_exchange"] += 1
        elif re.search(r"\bExchange\b", ln):
            counts["exchange"] += 1
        for kind in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "MapInArrow",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "AggregateInPandas",
            "PythonMapInArrow",
        ):
            if re.search(rf"\b{kind}\b", ln):
                counts["python_nodes"] += 1
                python_kinds.add(kind)
        if re.search(r"\bBroadcastHashJoin\b", ln):
            counts["bhj"] += 1
        if re.search(r"\bSortMergeJoin\b", ln):
            counts["smj"] += 1
        if re.search(r"\bShuffledHashJoin\b", ln):
            counts["shj"] += 1
        if re.search(r"\bBroadcastNestedLoopJoin\b", ln):
            counts["bnlj"] += 1
        if re.search(r"\bCartesianProduct\b", ln):
            counts["cartesian"] += 1
        if re.search(r"\bSort\b", ln) and "SortMergeJoin" not in ln:
            counts["sort"] += 1
        if re.search(r"\bWindow\b", ln):
            counts["window"] += 1
        if "Scan parquet" in ln:
            counts["scans"] += 1
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    counts["pushed_filters_nonempty"] = sum(1 for p in pushed if p.strip())
    counts["read_schema_widths"] = [
        len([c for c in rs.split(",") if ":" in c]) for rs in read_schema
    ]
    counts["python_kinds"] = sorted(python_kinds)
    counts["plan_lines"] = len(lines)
    return counts


def main() -> None:
    args = sys.argv[1:]

    def opt(name, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    tag = opt("--tag", "r14")
    suffix = opt("--suffix", "before")
    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    do_exec = "--exec" in args
    if do_exec:
        args.remove("--exec")
    only = set(args)

    from hive_jq_udtf_spark.plans.queries import QUERIES

    spark, staged = build_session(sf_dir)
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    summary: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        row: dict = {}
        t0 = time.time()
        try:
            spark.sparkContext.setJobDescription(f"planaudit build {name}")
            df = fn(spark, staged)
            plan = explain_str(df)
            row = summarize(plan)
            row["build_sec"] = round(time.time() - t0, 3)
            with open(
                os.path.join(outdir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            if do_exec:
                t1 = time.time()
                spark.sparkContext.setJobDescription(
                    f"planaudit exec {name}"
                )
                df.write.format("noop").mode("overwrite").save()
                row["noop_exec_sec"] = round(time.time() - t1, 3)
            row["driver_loop"] = bool(
                row["build_sec"] > 1.0 and "Scan ExistingRDD" in plan
            )
        except Exception as ex:
            row = {"error": f"{type(ex).__name__}: {ex}"[:300]}
            sys.stderr.write(f"planaudit {name} failed: {ex}\n")
        summary[name] = row
        import gc

        df = None
        gc.collect()
    with open(os.path.join(outdir, f"summary_{suffix}.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    n_err = sum(1 for r in summary.values() if "error" in r)
    print(
        json.dumps(
            {
                "queries": len(summary),
                "errors": n_err,
                "out": outdir,
                "suffix": suffix,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
