"""Count-min sketch heavy hitters — bounded-memory frequency
estimation (Cormode & Muthukrishnan 2005), Spark-first.

The sketch is a depth × width counter matrix.  Build shape: tokens
fan out to one (row j, bucket h_j(token)) cell per depth level, then a
single map-side-combinable groupBy — the shuffle carries AT MOST
depth × width rows per map partition regardless of corpus size, which
is the whole point at 100 TB (the exact per-token groupBy it replaces
shuffles one row per distinct token).  Estimates read the sketch with
a BROADCAST join (depth × width rows ≈ KBs).

Hashes are the repo's deterministic md5-bucket idiom (first 15 hex
chars as int, mod width — text.py::_split_bucket convention), so a
SQL oracle can replicate the sketch term-for-term and the classic
one-sided error bound (est ≤ true + (e/width)·N, w.p. 1−(1/e)^depth)
is verifiable exactly on both sides.

Reference parity note: the reference engine has no sketches; this is
part of the §2.6 LLM-data-pipeline mandate (BASELINE.json), same
family as hll_distinct (approx_count_distinct) and the MinHash tier.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_bucket(c: Column, width: int) -> Column:
    """First 15 hex chars of md5 as int, mod width — matches the
    DuckDB expression ('0x' || substr(md5(x),1,15))::BIGINT % width."""
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint") % width
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(j, bucket, cnt) counter cells; at most depth × width rows."""
    lv = tokens.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    bucket = _md5_bucket(
        F.concat(F.col("j").cast("string"), F.lit("|"), F.col("tok")), width
    )
    return (
        lv.select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-candidate CMS estimate: min over the depth rows of the
    candidate's bucket counters.  The sketch side is broadcast — the
    probe never shuffles the candidate set."""
    lv = candidates.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    bucket = _md5_bucket(
        F.concat(F.col("j").cast("string"), F.lit("|"), F.col("tok")), width
    )
    probed = lv.select("tok", "j", bucket.alias("bucket")).join(
        F.broadcast(sketch), ["j", "bucket"]
    )
    return probed.groupBy("tok").agg(F.min("cnt").alias("est_cnt"))


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Top-k tokens by CMS estimate, with exact counts and the
    one-sided error bound checked per token:

      token, true_cnt, est_cnt, overest (= est − true, provably ≥ 0),
      within_bound (overest ≤ (e/width)·N_tokens).

    Ordering is (est_cnt DESC, token) so the result is deterministic
    and exactly replicable by the SQL oracle."""
    from .index import tokenize

    toks = docs.select(F.explode(tokenize(docs, text_col)).alias("tok"))
    sketch = cms_build(toks, depth=depth, width=width)
    exact = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(exact.select("tok"), sketch, depth=depth, width=width)
    total = toks.agg(F.count("*").alias("n_tokens"))
    eps = math.e / width
    return (
        est.join(exact, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("tok").alias("token"),
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overest"),
            (
                (F.col("est_cnt") - F.col("true_cnt"))
                <= F.lit(eps) * F.col("n_tokens")
            ).alias("within_bound"),
        )
        .orderBy(F.desc("est_cnt"), "token")
        .limit(k)
    )
