"""Isolated A/B timing for single queries (guide §1): bench-like
session + staging, one cold pass per query, then N warm measurements
(fresh fn() + collect, exactly what bench.py times); prints min and
median per query plus a probe bracket so a stalled window is visible.

Usage: python tools/ab.py [--reps N] [--sf DIR] query [query ...]
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    args = sys.argv[1:]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from hive_jq_udtf_spark.plans.queries import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    local_dir = tempfile.mkdtemp(prefix="ab_local_", dir=shm)
    import atexit

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab")
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

    staged = tempfile.mkdtemp(prefix="ab_staged_", dir=shm)
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    import pyarrow.parquet as pq

    from hive_jq_udtf_spark.sources.tables import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(tbl, f"{staged}/{t}.parquet", row_group_size=32768)
    sf_dir = staged
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))

    spark.range(1000000).selectExpr("sum(id)").collect()

    def probe():
        t0 = time.time()
        spark.range(20_000_000).selectExpr("avg(id % 97)").collect()
        return round(time.time() - t0, 4)

    probe(), probe()

    print(f"{'min':>7} {'median':>7} {'probes':>16}  name")
    for name in names:
        fn = QUERIES[name]
        try:
            if name.startswith("stream"):
                fn(spark, sf_dir).collect()
            fn(spark, sf_dir).collect()  # cold
        except Exception as ex:
            print(f"COLD FAIL {name}: {ex}")
            continue
        gc.collect()
        ts = []
        ps = [probe()]
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.collect()
            ts.append(round(time.time() - t0, 3))
            del df
            gc.collect()
            ps.append(probe())
        print(
            f"{min(ts):7.3f} {statistics.median(ts):7.3f}"
            f" {str(ps):>16}  {name}  {ts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
