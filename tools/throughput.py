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

    def timeit(make_df, runs=5):
        """make_df: THUNK returning a fresh DataFrame.  Re-collecting
        one DataFrame object reuses its AQE-materialized shuffle /
        broadcast stages (measured r10: 7.7 s fresh vs 0.05 s
        re-collect on the same object), so each run must rebuild the
        plan; codegen/JIT warm-up is still absorbed by the untimed
        first build+collect."""
        make_df().collect()
        t0 = time.time()
        for _ in range(runs):
            make_df().collect()
        return (time.time() - t0) / runs

    for label, (sf_dir, _) in sizes.items():
        ev = load_table(spark, sf_dir, "events").select("props")
        ev = ev.repartition(par).localCheckpoint(eager=True)
        n = ev.count()

        def python_tier():
            return jq_explode(
                ev, "props", "{k: .k}", "k:int", native="never",
                min_parallelism=par,
            ).agg(F.sum("k"))

        def native_tier():
            return ev.select(
                F.explode(
                    F.array(
                        F.from_json(F.col("props"), "struct<k:int>").getField("k")
                    )
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

    # Whitening-projection kernel A/B at model-scale d (VERDICT r9
    # #7): interpreted aggregate() HOF vs Arrow BLAS Gram-block on a
    # synthetic d=512, k=8 corpus — the measurement behind
    # pca._WHITEN_ARROW_MIN_D.  Values agree to the 6-dp round
    # (summation-order ulps aside); this prints the timing evidence.
    import random as _random

    from hive_jq_udtf_spark.operators.pca import whiten_projection

    d, kk, nrows = 512, 8, 20000
    rng = _random.Random(42)
    vecs = spark.range(nrows).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {d}),"
            " i -> CAST(sin(id * 2654435761 + i * 40503) AS DOUBLE))"
        ).alias("embedding"),
    )
    vecs = vecs.repartition(par).localCheckpoint(eager=True)
    comps = [
        ([rng.uniform(-0.1, 0.1) for _ in range(d)], 1.0 + c) for c in range(kk)
    ]
    mu = [0.0] * d
    t_hof = timeit(
        lambda: whiten_projection(vecs, comps, mu, use_arrow=False).agg(
            F.sum("y")
        ),
        runs=3,
    )
    t_arrow = timeit(
        lambda: whiten_projection(vecs, comps, mu, use_arrow=True).agg(
            F.sum("y")
        ),
        runs=3,
    )
    print(
        json.dumps(
            {
                "bench": "whiten_projection_kernel_ab",
                "rows": nrows,
                "d": d,
                "k": kk,
                "hof_sec": round(t_hof, 4),
                "arrow_sec": round(t_arrow, 4),
                "speedup": round(t_hof / t_arrow, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
