"""Exact Jaccard set-similarity self-join via prefix filtering.

The scalable EXACT counterpart to the probabilistic near-dup tier in
``dedup.py`` (MinHash/SimHash trade recall for speed; this operator
guarantees every pair at or above the threshold is produced).  The
candidate rule is the AllPairs / PPJoin prefix filter (Bayardo,
Ma & Srikant, WWW'07; Xiao, Wang, Lin & Yu, WWW'08 — public
literature):

* order every document's distinct tokens by ascending corpus
  document-frequency (rarest first), ties broken by token string —
  a global total order;
* for Jaccard >= tau, any qualifying pair must share a token inside
  each side's PREFIX of length ``|x| - ceil(tau*|x|) + 1``:
  J >= tau implies the overlap o >= tau*max(|x|,|y|); if the
  smallest-ordered common token were outside x's prefix, all common
  tokens would fit in x's suffix of ceil(tau*|x|) - 1 < o slots —
  contradiction, and symmetrically for y;
* so bucketing on prefix tokens only (the rarest ones — smallest
  buckets) finds every candidate, and an exact ``array_intersect``
  verification removes false positives;
* PPJoin's positional filter prunes candidates before the verify
  join: a common token at (1-based) position ``i`` of x's order and
  ``j`` of y's order bounds the overlap by ``1 + min(|x|-i, |y|-j)``
  (everything before the shared token on each side is, at best,
  non-shared), and J >= tau needs overlap >=
  ``ceil(tau/(1+tau) * (|x|+|y|))`` — integer form
  ``(tau_num+tau_den) * bound >= tau_num * (|x|+|y|)``.

Scale shape: token document frequencies are one map-combined count;
prefixes shrink the bucket join to the rare end of the vocabulary
(the hot tokens a plain token-bucket join would quadratically blow
up on never enter a prefix unless a document is almost entirely hot
tokens); verification is pure codegen over the candidate pairs.
Output volume is inherently |qualifying pairs| — an exact threshold
join cannot emit less — so downstream consumers aggregate per
group, as ``setsim_neardup`` does.

All thresholds are exact integer arithmetic (tau = tau_num/tau_den,
similarity reported in integer basis points) so cross-engine
comparison never touches float drift (docs/oracle_determinism.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def setsim_join_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    tau_num: int = 9,
    tau_den: int = 10,
    payload: tuple[str, ...] = (),
    materialize: bool = True,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) >=
    tau_num/tau_den, exactly.

    Returns (id_a, id_b, inter_sz, union_sz, jacc_bp) plus
    ``payload`` columns carried through as ``<name>_a`` /
    ``<name>_b``.  ``jacc_bp`` is ``(10000*inter) DIV union`` —
    integer basis points.

    The prepared (id, tokens, size) frame feeds four consumers
    (frequency count, prefix build, both verification sides) and the
    signature frame feeds both sides of the bucket join; each is
    materialized once (the supplier_affinity_cn lesson: Catalyst
    does not ReusedExchange identical subtrees across AQE stage
    boundaries).  ``materialize=False`` skips both internal
    localCheckpoints — pass it when ``docs`` is itself already
    materialized AND small (e.g. the distinct-set frame in
    setsim_neardup): recomputing the consumers is then cheaper than
    the extra blocking jobs.
    """
    if not 0 < tau_num <= tau_den:
        raise ValueError("tau must be in (0, 1]")
    t = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(F.col(tokens_col)).alias("toks"),
            *[F.col(c) for c in payload],
        )
        .withColumn("sz", F.size("toks"))
        .where(F.col("sz") >= 1)
    )
    if materialize:
        t = t.localCheckpoint(eager=True)

    freq = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # rarest-first global order = ascending (df, tok); prefix length
    # p = sz - ceil(tau*sz) + 1, all integer arithmetic
    ceil_tau_sz = f"(({tau_num} * sz + {tau_den - 1}) DIV {tau_den})"
    sig = (
        t.select("_id", "sz", F.explode("toks").alias("tok"))
        .join(freq, "tok")
        .groupBy("_id", "sz")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("o"))
        .select(
            "_id",
            "sz",
            F.posexplode(
                F.expr(f"slice(o, 1, CAST(sz - {ceil_tau_sz} + 1 AS INT))")
            ).alias("pos0", "s"),
        )
        # pos is the token's 1-based rank in the FULL ordered token
        # list (slice keeps the first p positions), for the
        # positional filter below
        .select(
            "_id", "sz", F.col("s.tok").alias("tok"),
            (F.col("pos0") + 1).alias("pos"),
        )
    )
    if materialize:
        sig = sig.repartition(F.col("tok")).localCheckpoint(eager=True)

    a = sig.select(
        F.col("_id").alias("_ia"), F.col("sz").alias("_pa"),
        F.col("pos").alias("_qa"), "tok",
    )
    b = sig.select(
        F.col("_id").alias("_ib"), F.col("sz").alias("_pb"),
        F.col("pos").alias("_qb"), "tok",
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("_ia") < F.col("_ib"))
            # size filter: J >= tau requires min >= tau*max
            & (
                tau_den * F.least("_pa", "_pb")
                >= tau_num * F.greatest("_pa", "_pb")
            )
            # positional filter (PPJoin): overlap upper bound from
            # this shared token's ranks must reach the required
            # overlap ceil(tau/(1+tau)*(sza+szb))
            & (
                (tau_num + tau_den)
                * (
                    1
                    + F.least(
                        F.col("_pa") - F.col("_qa"),
                        F.col("_pb") - F.col("_qb"),
                    )
                )
                >= tau_num * (F.col("_pa") + F.col("_pb"))
            )
        )
        .select("_ia", "_ib")
        # explicit hash layout: AQE would coalesce the dedupe's tiny
        # compressed shuffle to one task; the verify join below then
        # inherits the parallel (_ia)-compatible layout
        .repartition(par, "_ia", "_ib")
        .dropDuplicates()
    )

    ta = t.select(
        F.col("_id").alias("_ia"),
        F.col("toks").alias("_ta"),
        F.col("sz").alias("_sa"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    )
    tb = t.select(
        F.col("_id").alias("_ib"),
        F.col("toks").alias("_tb"),
        F.col("sz").alias("_sb"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    # no broadcast hint: both verification sides are corpus-sized at
    # the design point (AQE may still pick broadcast at toy SF)
    pairs = (
        cand.join(ta, "_ia")
        .join(tb, "_ib")
        .withColumn("inter_sz", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn("union_sz", F.col("_sa") + F.col("_sb") - F.col("inter_sz"))
        .where(tau_den * F.col("inter_sz") >= tau_num * F.col("union_sz"))
        .withColumn(
            "jacc_bp",
            F.expr("CAST((10000 * inter_sz) DIV union_sz AS BIGINT)"),
        )
    )
    return pairs.select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        "inter_sz",
        "union_sz",
        "jacc_bp",
        *[f"{c}_a" for c in payload],
        *[f"{c}_b" for c in payload],
    )
