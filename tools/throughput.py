"""Engine-level throughput budget (BASELINE.md last row / SURVEY §6):
the Python jq-UDTF tier must stay within 2x of an equivalent native
from_json + explode pipeline on events.props, measured at 1k / 10k /
100k rows.  Prints one JSON line per size."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hive_jq_udtf_spark.sources.tables import load_table
    from hive_jq_udtf_spark.udtf import jq_explode

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    sizes = {
        "1k": ("/root/testdata/sf0.001", 1000),
        "10k": ("/root/testdata/sf0.01", 10000),
        "100k": ("/root/testdata/sf0.1", 100000),
    }

    def timeit(df, runs=5):
        df.collect()  # absorb codegen/JIT/worker warm-up
        t0 = time.time()
        for _ in range(runs):
            df.collect()
        return (time.time() - t0) / runs

    for label, (sf_dir, _) in sizes.items():
        ev = load_table(spark, sf_dir, "events").select("props")
        ev = ev.repartition(par).localCheckpoint(eager=True)
        n = ev.count()

        python_tier = jq_explode(
            ev, "props", "{k: .k}", "k:int", native="never", min_parallelism=par
        ).agg(F.sum("k"))
        native_tier = ev.select(
            F.explode(
                F.array(F.from_json(F.col("props"), "struct<k:int>").getField("k"))
            ).alias("k")
        ).agg(F.sum("k"))

        tp = timeit(python_tier)
        tn = timeit(native_tier)
        print(
            json.dumps(
                {
                    "rows": n,
                    "size": label,
                    "python_jq_sec": round(tp, 4),
                    "native_sec": round(tn, 4),
                    "ratio": round(tp / tn, 2),
                    "python_rows_per_sec": int(n / tp),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
