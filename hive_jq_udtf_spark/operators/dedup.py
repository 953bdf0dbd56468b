"""Deduplication operators for large-scale text pipelines (driver
mandate, SURVEY §2.6).

All of these stay JVM-side (built-in functions + higher-order
expressions — no Python UDFs in any hot path) and are written for
the 100 TB shape:

- exact / fingerprint dedup: hash + groupBy — one shuffle on the
  hash, map-side partial aggregation for the counts.
- exact n-gram Jaccard: the distributed inverted-index shingle join
  (explode → hash join on shingle → pair aggregation).  Exact, but
  pair cardinality is data-dependent; at very high duplication rates
  switch to the MinHash-LSH variant below which prunes candidates to
  near-duplicate buckets first.
- MinHash-LSH: per-doc signatures via xxhash64 min-hashing (pure
  codegen expressions), banded LSH bucketing, exact Jaccard
  verification on candidates only.  This is the 100 TB path: the
  only shuffle of full rows is on (band_idx, band_hash), whose
  cardinality is O(docs × bands), independent of pair count.
- SimHash: 64-bit signatures via per-token hashing + bitwise
  majority vote, all in aggregate expressions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact / fingerprint
# ---------------------------------------------------------------------------


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts of exact duplicates by content hash (md5)."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text_col)))).alias("n_dupes"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact content hash.

    groupBy on the hash (one shuffle); survivors join back by id —
    at scale prefer this over dropDuplicates so the keeper choice is
    deterministic."""
    keep = (
        docs.select(F.md5(F.col(text_col)).alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")


def exact_dedup_single_pass(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    project: list[str] | None = None,
) -> DataFrame:
    """Exact dedup as ONE pass over the input: hash computed BEFORE
    the exchange, min-id keeper via row_number inside each hash group.

    Versus :func:`exact_dedup`'s groupBy+semi-join, this evaluates the
    upstream plan once (the semi-join's build and probe branches each
    recompute it — expensive when the input is a filtered projection
    with heavy expressions), shuffles once, and the exchange carries
    ``project`` + a 32-byte hash instead of the document text.  Use it
    when downstream stages don't need ``text_col``; at 100 TB that
    turns a full-corpus-sized shuffle into a metadata-sized one."""
    from pyspark.sql import Window

    cols = project if project is not None else [
        c for c in docs.columns if c != text_col
    ]
    w = Window.partitionBy("__h").orderBy(id_col)
    return (
        docs.select(*cols, F.md5(F.col(text_col)).alias("__h"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def fingerprint_dedup_stats(
    docs: DataFrame, prefix_len: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dedup stats by prefix fingerprint (rolling-hash stand-in:
    md5 of the normalized document head)."""
    fp = docs.select(
        F.col(id_col), F.md5(F.substring(F.col(text_col), 1, prefix_len)).alias("f")
    )
    kept = fp.groupBy("f").agg(F.min(id_col).alias("keeper"))
    n_kept = kept.agg(F.count("*").alias("n_kept"))
    n_all = fp.agg(F.count("*").alias("n_all"))
    return n_kept.crossJoin(n_all).select(
        "n_kept", (F.col("n_all") - F.col("n_kept")).alias("n_removed")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def shingles_col(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> — pure
    higher-order expressions (codegen, no Python)."""
    toks = F.split(text_col, " ")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "prefix",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above threshold.

    method="prefix" (default): prefix-filtered set-similarity join
    (PPJoin-family): shingles get a global canonical order (document
    frequency ascending — rarest first), each doc only emits its
    first |d| - ceil(t·|d|) + 1 shingles to the inverted index, and
    candidates passing the length filter are verified against full
    shingle sets.  EXACT for the given threshold — a qualifying pair
    must share at least one prefix shingle — while shuffling ~(1-t)
    of the shingle volume and pruning the frequent-shingle pair
    blow-up that makes the naive join quadratic at 100 TB.

    method="invert": the plain inverted-index join (reference
    semantics baseline; used by tests to cross-check prefix).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    if method == "invert":
        return _jaccard_invert(docs, n, threshold, text_col, id_col)
    if method != "prefix":
        raise ValueError("method must be prefix|invert")
    t = float(threshold)
    # shingles hashed to int64 (cheaper shuffle/compare than strings)
    sh = docs.select(
        F.col(id_col).alias("did"),
        F.explode(shingles_col(F.col(text_col), n)).alias("s"),
    ).select("did", F.xxhash64("s").alias("h"))
    df_counts = sh.groupBy("h").agg(F.count("*").alias("df"))
    ordered = (
        sh.join(df_counts, "h")
        .groupBy("did")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "h"))).alias("arr"),
        )
        .select(
            "did",
            F.transform("arr", lambda x: x["h"]).alias("full"),
            F.size("arr").alias("sz"),
        )
    )
    # referenced by the prefix index AND both sides of verification —
    # persist so the shingle aggregation runs once, not 4× (at scale
    # this is the dominant stage)
    ordered = ordered.persist()
    # prefix length |d| - ceil(t*|d|) + 1
    pref_len = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1).cast("int")
    prefixes = ordered.select(
        "did",
        "sz",
        F.explode(F.slice("full", 1, pref_len)).alias("h"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.did") < F.col("b.did"))
            # length filter: t*|a| <= |b| <= |a|/t possible only when
            & (F.col("b.sz") >= F.ceil(F.lit(t) * F.col("a.sz")))
            & (F.col("a.sz") >= F.ceil(F.lit(t) * F.col("b.sz"))),
        )
        .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .distinct()
    )
    fa = ordered.select(F.col("did").alias("doc_a"), F.col("full").alias("fa"))
    fb = ordered.select(F.col("did").alias("doc_b"), F.col("full").alias("fb"))
    return (
        cands.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("fa", "fb"))
            / F.size(F.array_union("fa", "fb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _jaccard_invert(
    docs: DataFrame, n: int, threshold: float, text_col: str, id_col: str
) -> DataFrame:
    sh = docs.select(
        F.col(id_col).alias("did"), F.explode(shingles_col(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy("did").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("did").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("did").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB candidate-pruning path)
# ---------------------------------------------------------------------------


def minhash_signature_col(sh_col: Column, num_perms: int = 128) -> Column:
    """MinHash signature as array<bigint>: perm i = min over shingles
    of xxhash64(shingle, i).  Seeded xxhash64 *is* the family of hash
    functions — deterministic, JVM codegen.

    NOTE the closure factory: a `lambda s, i=i` two-parameter lambda
    would be interpreted by F.transform as (element, INDEX) and the
    permutation seed silently replaced by the array position."""

    def perm_hash(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    sigs = [F.array_min(F.transform(sh_col, perm_hash(i))) for i in range(num_perms)]
    return F.array(*sigs)


def _minhash_sig_udf(num_perms: int, seed: int = 42):
    """Arrow-batched signature kernel: input = array<bigint> of base
    shingle hashes (computed once, JVM-side xxhash64), output =
    array<bigint> MinHash signature.  All ``num_perms`` permutations
    are affine maps a_i·h + b_i over uint64 (a_i odd ⇒ bijective),
    evaluated as ONE vectorized (perms × shingles) numpy min-reduce
    per row — replaces num_perms interpreted HOF expressions."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    a = (rng.randint(1, 2**62, size=num_perms, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perms, dtype=np.int64).astype(np.uint64)
    empty = np.full(num_perms, np.iinfo(np.int64).max, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            H = np.asarray(h, dtype=np.int64).view(np.uint64)
            if H.size == 0:
                out.append(empty)
                continue
            out.append((a[:, None] * H[None, :] + b[:, None]).min(axis=1).view(np.int64))
        return pd.Series(out)

    return sig


def add_minhash(
    docs: DataFrame,
    n: int = 3,
    num_perms: int = 128,
    text_col: str = "text",
    impl: str = "pandas",
) -> DataFrame:
    """NOTE: the two impls produce different (both valid) signature
    FAMILIES — "pandas" = affine permutations of xxhash64(shingle),
    "expr" = seeded xxhash64(shingle, i).  Signatures from different
    impls (or persisted before the pandas kernel was introduced) are
    mutually incompatible: LSH-joining across families silently
    yields ~zero collisions.  Recompute signatures with ONE impl for
    any persisted corpus."""
    sh = shingles_col(F.col(text_col), n)
    docs = docs.withColumn("__shingles", sh)
    if impl == "expr":
        return docs.withColumn(
            "minhash", minhash_signature_col(F.col("__shingles"), num_perms)
        )
    base = F.transform(F.col("__shingles"), lambda s: F.xxhash64(s))
    return docs.withColumn("minhash", _minhash_sig_udf(num_perms)(base))


def lsh_candidate_pairs(
    with_sig: DataFrame,
    bands: int = 16,
    rows: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidates.

    Shuffle key is (band_idx, band_hash): cardinality O(docs×bands),
    never O(pairs).  Returns distinct (doc_a, doc_b), doc_a < doc_b."""
    band_hashes = F.array(
        *[
            F.xxhash64(F.concat_ws(",", *[F.col("minhash")[b * rows + r] for r in range(rows)]))
            for b in range(bands)
        ]
    )
    banded = with_sig.select(
        F.col(id_col).alias("did"), F.posexplode(band_hashes).alias("band_idx", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    num_perms: int = 128,
    bands: int = 16,
    rows: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidates + exact Jaccard verification.

    At threshold t, catch probability per true pair is
    1-(1-t^rows)^bands (≈1 for t≥0.9 at 16×8); verification is exact
    so no false positives."""
    # Spread the signature computation across the cluster even when
    # the source is a single row group, and materialize it once — it
    # feeds BOTH the LSH-candidate join and the exact-verify join.
    par = docs.sparkSession.sparkContext.defaultParallelism
    with_sig = add_minhash(
        docs.repartition(par), n=n, num_perms=num_perms, text_col=text_col
    ).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(with_sig, bands=bands, rows=rows, id_col=id_col)
    sh = with_sig.select(F.col(id_col).alias("did"), F.col("__shingles").alias("sh"))
    a = sh.select(F.col("did").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("did").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            # try_divide: two empty-shingle docs (shorter than n
            # tokens) share the sentinel signature and reach the
            # verifier with |union| = 0 — their jaccard is undefined
            # (NULL), never a match, not an ANSI error.
            "jaccard",
            F.try_divide(
                F.size(F.array_intersect("sh_a", "sh_b")),
                F.size(F.array_union("sh_a", "sh_b")),
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_dedup(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Remove near-duplicates: drop the higher id of each matched
    pair (greedy single-pass; full transitive clustering would use
    iterative label propagation — see connected_components)."""
    pairs = minhash_neardup_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col, **kw
    )
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Label propagation over (doc_a, doc_b) edges → (doc_id,
    component) with component = min reachable id.  Iterative
    small-step joins; each iteration is one shuffle.  Converges in
    O(log longest-path) iterations for dedup-cluster shapes."""
    # Materialize the edge list ONCE — it is reused every iteration,
    # and without this the (possibly expensive) pair-generation
    # lineage (e.g. a similarity join) re-executes per iteration.
    edges = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    sym = edges.union(edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
    from pyspark.sql import Observation

    def _observed_checkpoint(df: DataFrame) -> tuple[DataFrame, tuple]:
        """Materialize a label frame and read its fixed-point stats
        (count + order-invariant xor hash of (id, comp)) off the SAME
        job via observe() — no per-iteration join + limit-count job
        (the lsss convention below)."""
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "comp")).alias("h"),
            # second INDEPENDENT hash (salted) squares the odds of an
            # xor-collision terminating propagation early: ~2^-128 per
            # round instead of ~2^-64 (ADVICE r4)
            F.bit_xor(F.xxhash64(F.lit("cc2"), "id", "comp")).alias("h2"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return out, (m["n"], m["h"], m["h2"])

    labels, stats = _observed_checkpoint(
        sym.select(F.col("doc_a").alias("id"))
        .union(sym.select(F.col("doc_b").alias("id")))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.doc_b == labels.id)
            .select(F.col("doc_a").alias("id"), F.col("comp"))
            .union(labels.select("id", "comp"))
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # labels are min-monotone and the id set is fixed, so equal
        # (count, xor-hash) across rounds IS the fixed point
        labels, new_stats = _observed_checkpoint(prop)
        if new_stats == stats:
            break
        stats = new_stats
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


def connected_components_lsss(
    pairs: DataFrame, max_iter: int = 30, shuffle_partitions: int | None = None
) -> DataFrame:
    """Large-star / small-star connected components (the alternating-
    star algorithm from the MapReduce-CC literature, e.g. Kiveris et
    al.): each round contracts edges toward the component minimum by
    two grouped aggregations, converging in O(log²|V|) rounds on ANY
    graph — long chains included — where one-hop min-label
    propagation (``connected_components``) needs O(diameter) rounds.

    large-star: per node u, m = min(u ∪ Γ(u)); re-link every LARGER
    neighbor v > u to m.  small-star: orient edges large→small; per
    node u, m = min of its (smaller) neighbors; link u and every
    smaller neighbor to m.  The edge set is localCheckpoint-ed per
    round (bounded lineage); per-round cost is a constant number of
    shuffles keyed by node id.  Returns (doc_id, component = min id
    reachable).  Raises RuntimeError if not converged in max_iter —
    the bound is logarithmic, so hitting it means the input is
    pathological, not slow.

    shuffle_partitions: scope a smaller shuffle width around the
    iteration — an edge graph orders of magnitude smaller than the
    corpus (the dedup norm) pays per-round scheduling for every
    partition; size it to the EDGE volume, not the corpus default.
    The conf is restored before returning (the final labels join runs
    at the caller's width)."""
    import contextlib

    spark = pairs.sparkSession

    @contextlib.contextmanager
    def _scoped_shuffle():
        if shuffle_partitions is None:
            yield
            return
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    with _scoped_shuffle():
        return _lsss_run(pairs, max_iter)


def _lsss_run(pairs: DataFrame, max_iter: int) -> DataFrame:
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).where(
        F.col("u") != F.col("v")
    )
    nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    def _observed_checkpoint(df: DataFrame) -> tuple[DataFrame, tuple]:
        """Materialize df (eager localCheckpoint) and piggyback the
        convergence stats (count, order-invariant xor-hash) on the
        SAME job via observe() — zero extra actions per round."""
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
            # salted second hash squares the xor-collision odds (ADVICE r4)
            F.bit_xor(F.xxhash64(F.lit("lsss2"), "u", "v")).alias("h2"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return out, (m["n"], m["h"], m["h2"])

    # normalized undirected edge set: (hi, lo)
    cur, cur_stats = _observed_checkpoint(
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    converged = False
    for _ in range(max_iter):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m = min(u, min Γ(u)); (v, m) for neighbors v > u
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        lsn = (
            ls.where(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )
        # small-star on the large→small orientation: m = min smaller
        # neighbor; link u and every smaller neighbor to m
        smins = lsn.groupBy("u").agg(F.min("v").alias("m"))
        j = lsn.join(smins, "u")
        # zero-extra-job fixed-point check: the normalized DISTINCT
        # edge sets are equal iff (count, order-independent xor of
        # xxhash64) agree; both ride the materialization job via
        # observe() (bit_xor: no ANSI overflow, order-invariant,
        # sound on distinct sets), and the previous round's stats are
        # carried in Python instead of being recomputed.
        ss, ss_stats = _observed_checkpoint(
            j.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(j.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )
        if ss_stats == cur_stats:
            cur = ss
            converged = True
            break
        cur, cur_stats = ss, ss_stats
    if not converged:
        raise RuntimeError(
            f"connected_components_lsss did not converge in {max_iter} rounds"
        )
    # at convergence every edge is a star spoke (node, root)
    comp = cur.groupBy("u").agg(F.min("v").alias("comp"))
    return nodes.join(comp, nodes.id == comp.u, "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.col("comp"), F.col("id")).alias("component"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, bitwise
    majority vote via 64 conditional-sum aggregates (all codegen)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash60_portable(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Engine-portable 60-bit SimHash: token hash = first 15 hex
    chars of md5 parsed as an integer (computable bit-identically in
    any ANSI-SQL engine — DuckDB: ('0x'||substr(md5(t),1,15))::bigint
    — which is what makes this variant oracle-checkable, unlike the
    xxhash64 simhash64 above).  Bit-majority vote via 60 conditional
    sums: one groupBy shuffle on the id, partial aggregation
    map-side, all codegen."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1).cast("long")) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(60)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(60):
        sim = sim + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash60_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by portable 60-bit SimHash.  Blocking: 4
    chunks of 15 bits — by pigeonhole any pair within hamming ≤ 3
    agrees on ≥ 1 chunk, so the chunk equi-join finds EVERY such
    pair (exact, not probabilistic) while shuffling on chunk values
    instead of forming n² pairs.  Exact hamming verified with
    bit_count(xor)."""
    if max_hamming > 3:
        raise ValueError("4x15-bit blocking is only exact for max_hamming <= 3")
    # materialize the signature once: the 60-conditional-sum vote over
    # the exploded token stream is the expensive pass, and it feeds
    # BOTH sides of the chunk self-join (measured 3.1 -> ~1.9 s at
    # sf0.1); the frame is |docs| rows of (id, long)
    sh = simhash60_portable(docs, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=True
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned(F.col("simhash"), i * 15)
                .bitwiseAND(F.lit(0x7FFF).cast("long"))
                .alias("cv"),
            )
            for i in range(4)
        ]
    )
    blocked = sh.select(
        F.col(id_col).alias("did"), F.col("simhash"), F.explode(chunks).alias("ch")
    ).select("did", "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_neardup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit chunks (a pair
    within hamming ≤3 of 64 bits shares at least one of 4 chunks),
    verify hamming distance exactly via bit_count(xor)."""
    sh = simhash64(docs, text_col=text_col, id_col=id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for i in range(4)
        ]
    )
    blocked = sh.select(
        F.col(id_col).alias("did"), F.col("simhash"), F.explode(chunks).alias("ch")
    ).select("did", "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# C4-style global span (chunk) dedup
# ---------------------------------------------------------------------------


def chunk_dedup(
    docs: DataFrame,
    width: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global span-level exact dedup (the C4 / "three-sentence" rule
    re-expressed over fixed-width word windows, since the corpus has
    no newline structure): every document is cut into non-overlapping
    ``width``-word chunks; a chunk occurrence is REMOVED when the
    same chunk text appeared earlier in the corpus (earlier =
    smaller (doc_id, chunk_idx)); each document is reassembled from
    its surviving chunks in order.

    Returns one row per document: n_chunks, n_removed, and
    kept_hash = md5 of the reassembled text ("" when everything was
    removed) so the rebuilt corpus is value-checked, not just counted.

    100 TB shape: two shuffles, both on bounded keys — one window
    shuffle on the chunk text (same key volume as the exact-dedup
    groupBy; hash the chunk to fixed width upstream if span strings
    get long), one groupBy back on doc_id.  No self-join, no
    pair-cardinality blowup: global keeper election is a
    row_number() per chunk key, the distributed analog of "keep
    first occurrence"."""
    from pyspark.sql.window import Window

    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(width)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(F.slice(words, i * width + F.lit(1), width), " "),
    )
    ch = docs.select(F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
    w = Window.partitionBy("chunk").orderBy(id_col, "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("chunk_idx"), F.col("chunk"))
    )  # null (dropped by collect_list) for removed occurrences
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_removed"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s["chunk"],
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("kept_hash"),
        )
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def ngram_col(words: Column, n: int) -> Column:
    """Sliding word n-grams of a split-text array as an array<string>
    (empty when the document is shorter than n).  Pure codegen."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-set decontamination (the public GPT-3/PaLM appendix
    recipe): a training document is CONTAMINATED when it shares any
    word n-gram with any evaluation document.  Returns the training
    rows with a boolean ``contaminated`` column.

    100 TB shape: the eval side is tiny relative to the corpus, so
    its distinct n-gram set is broadcast and the check is a broadcast
    LEFT SEMI join on the n-gram string — the corpus is never
    shuffled.  (Drop the broadcast() hint if the eval set ever
    outgrows an executor; Catalyst then falls back to a shuffled
    semi-join on the same key.)"""
    ev_grams = (
        eval_docs.select(F.explode(ngram_col(F.split(F.col(text_col), " "), n)).alias("g"))
        .distinct()
    )
    tr_grams = docs.select(
        F.col(id_col), F.explode(ngram_col(F.split(F.col(text_col), " "), n)).alias("g")
    )
    contaminated = (
        tr_grams.join(F.broadcast(ev_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(contaminated, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )
