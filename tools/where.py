"""Decompose a query's warm bench time (guide §1.1 first-principles):

  t_py    = fn(spark, sf_dir)         # Python Column-tree build
  t_full  = fresh fn() + collect      # what bench.py times
  t_exec  = re-collect the SAME df    # pure execution (plan cached on df)
  => plan-side (analysis+optimize+codegen-lookup) ~= t_full - t_py - t_exec

Usage: python tools/where.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from hive_jq_udtf_spark.plans.queries import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shm = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    local_dir = tempfile.mkdtemp(prefix="where_local_", dir=shm)
    import atexit

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("where")
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

    # stage like bench.py
    staged = tempfile.mkdtemp(prefix="where_staged_", dir=shm)
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    import pyarrow.parquet as pq

    from hive_jq_udtf_spark.sources.tables import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(tbl, f"{staged}/{t}.parquet", row_group_size=32768)
    sf_dir = staged
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))

    spark.range(1000000).selectExpr("sum(id)").collect()

    print(f"{'t_py':>7} {'t_full':>7} {'t_exec':>7} {'plan~':>7}  name")
    for name in names:
        fn = QUERIES[name]
        # cold pass (absorb codegen JIT, like bench)
        try:
            fn(spark, sf_dir).collect()
        except Exception as ex:
            print(f"COLD FAIL {name}: {ex}")
            continue
        t0 = time.time()
        df_py = fn(spark, sf_dir)
        t_py = time.time() - t0

        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        t_full = time.time() - t0

        t0 = time.time()
        df.collect()
        t_exec = time.time() - t0

        plan = t_full - t_py - t_exec
        print(
            f"{t_py:7.3f} {t_full:7.3f} {t_exec:7.3f} {plan:7.3f}  {name}"
        )
        del df, df_py
        import gc

        gc.collect()
    spark.stop()


if __name__ == "__main__":
    main()
