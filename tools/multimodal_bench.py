"""Multimodal decode throughput harness (PLAN_r2 #6).

Measures the Arrow/mapInPandas decode path at realistic binary
payload sizes (100 KB - 10 MB) across `spark.sql.execution.arrow.
maxRecordsPerBatch` settings.  The decoder is the deterministic fake
(numpy byte-histogram moments — same batch shape as a real
decode+embed stage; the codec call is the swappable slot, see
operators/multimodal.py).

What this pins down for the 100 TB design (measured local[32],
8-partition stream, ~0.4-0.5 GB per config):
- batch BYTES = rows/batch x payload size is the working-set unit a
  Python worker holds (input batch + Arrow buffers); maxRecordsPerBatch
  must be sized to payload class, or a 10 MB-payload corpus at the
  10k-row default means ~100 GB batches — an immediate OOM.
- throughput is FLAT-TO-FALLING as batch size grows at >=100 KB
  payloads (0.8-1.2 GB/s aggregate at every batch setting; the
  biggest batches are consistently the slowest — buffer pressure,
  no amortization left to win): per-batch Python/Arrow overhead is
  already irrelevant when one batch is megabytes.  Conclusion: cap
  maxRecordsPerBatch aggressively for big payloads (bound memory);
  it costs nothing.

Payloads are generated JVM-side (repeat + encode — never on the
driver); one JSON line per (payload, batch) config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

DIM = 8


def _decode_batch(batches):
    """Vectorized fake decoder: numpy stride-sum moments per payload."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        feats = []
        for content in pdf["content"]:
            if content is None:
                feats.append([0.0] * DIM)
                continue
            arr = np.frombuffer(content, dtype=np.uint8)
            feats.append(
                [
                    float(arr[i::DIM].sum(dtype=np.int64) % 997) / 997.0
                    for i in range(DIM)
                ]
            )
        yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    # (payload bytes, row count, batch caps) — each config streams
    # ~400-500 MB over a FIXED 8 partitions so rows-per-partition
    # actually exceeds the batch caps (real batch-size variation; at
    # the corpus default of 32+ partitions a 48-row 10 MB corpus gets
    # 1-2-row batches no matter the cap)
    n_part = 8
    configs = [
        (100 * 1024, 4000, [8, 64, 500]),
        (1024 * 1024, 400, [4, 16, 50]),
        (10 * 1024 * 1024, 48, [1, 2, 6]),
    ]

    for size, n, batch_rows in configs:
        src = (
            spark.range(n)
            .select(
                F.col("id").alias("media_id"),
                F.encode(
                    F.concat(
                        F.repeat(F.lit("x"), size - 20),
                        F.lpad(F.col("id").cast("string"), 20, "0"),
                    ),
                    "utf-8",
                ).alias("content"),
            )
            .repartition(n_part)
            .localCheckpoint(eager=True)  # generation cost out of the timing
        )
        total_mb = size * n / 1e6

        def fresh(tag: int):
            # a FRESH plan per run: re-collecting one DataFrame reuses
            # its shuffle map outputs, silently skipping the Python
            # stage — the tag keeps every timed run a new lineage
            return src.mapInPandas(
                _decode_batch, "media_id long, feature array<double>"
            ).agg((F.sum(F.element_at("feature", 1)) + F.lit(tag * 0.0)).alias("s"))

        seq = [0]
        for br in batch_rows:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(br))
            seq[0] += 1
            fresh(seq[0]).collect()  # warm workers/codegen for this config
            runs = 3
            t0 = time.time()
            for _ in range(runs):
                seq[0] += 1
                fresh(seq[0]).collect()
            dt = (time.time() - t0) / runs
            print(
                json.dumps(
                    {
                        "payload_kb": size // 1024,
                        "batch_rows": br,
                        "batch_mb": round(size * br / 1e6, 1),
                        "rows": n,
                        "total_mb": round(total_mb, 1),
                        "sec": round(dt, 3),
                        "mb_per_s": round(total_mb / dt, 1),
                        "rows_per_s": round(n / dt, 1),
                    }
                )
            )
        src.unpersist()


if __name__ == "__main__":
    main()
