"""Similarity search over embedding columns (SURVEY §2.6).

Embeddings are ``array<float>`` columns; all math runs in JVM
higher-order expressions (zip_with / aggregate) in double precision
— no Python worker anywhere.

- brute_force_topk: exact cosine top-k.  Norms are precomputed per
  side *before* the join; the query side is broadcast (top-k search
  with a small query set against a huge corpus is the common shape —
  corpus is never shuffled, each partition scores its slice and the
  final top-k is a cheap window over k×|queries| rows).
- srp_topk: sign-random-projection LSH bucketing + exact re-rank
  within buckets — the approximate scale path when the query set is
  also huge (turns the cross join into an equi-join on bucket).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "__norm") -> DataFrame:
    return df.withColumn("__vec_d", _to_double(F.col(vec_col))).withColumn(
        out, norm_col(F.col("__vec_d"))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    Returns (query_id, neighbor_id, rank, cosine); ties broken by
    neighbor_id for determinism."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec_d").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_bucket_col(vec_d: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: packed sign bits of the dot
    products with fixed hyperplanes (literal arrays — codegen)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        d = dot_col(vec_d, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket; exact
    cosine re-rank within candidates.  The cross join becomes an
    equi-join on bucket — shuffle keyed by bucket, O(n/2^planes)
    expected candidates per query."""
    planes = _random_hyperplanes(dim, n_planes, seed)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    q = q.withColumn("bucket", srp_bucket_col(F.col("qv"), planes))
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec_d").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    c = c.withColumn("bucket", srp_bucket_col(F.col("cv"), planes))
    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def pairwise_cosine(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", threshold: float = 0.9
) -> DataFrame:
    """All pairs above a cosine threshold (embedding near-dup
    detection).  Quadratic — use srp buckets first at scale."""
    d = with_norm(df, vec_col).select(
        F.col(id_col).alias("did"), F.col("__vec_d").alias("v"), F.col("__norm").alias("n")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.did") < F.col("b.did"))
        .withColumn(
            "cosine",
            dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.did").alias("vec_a"), F.col("b.did").alias("vec_b"), "cosine"
        )
    )
