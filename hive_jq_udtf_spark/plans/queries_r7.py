"""Round-7 additions — four new operator families, each designed
integer-exact where floats would make cross-engine hashes fragile
(docs/oracle_determinism.md):

- ``embedding_quantize_int8`` — per-dimension int8 quantization
  audit (clip counts + reconstruction error) with power-of-two
  scales so every arithmetic step is bit-identical across engines.
- ``supplier_affinity_cn`` — common-neighbor link prediction on the
  part–supplier bipartite graph, bucketed by shared part with a
  degree cap (never all-pairs).
- ``ngram_novelty`` — per-source novelty profile: share of each
  document's DISTINCT word-trigrams that no other document uses,
  reported as exact integer basis points.
- ``pareto_frontier`` — distributed 2-D skyline (maximize
  p_retailprice, minimize p_size) via per-key aggregation + a
  bounded-domain prefix max, no quadratic dominance join.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES

# ---------------------------------------------------------------------------
# embedding_quantize_int8 — per-dimension quantization audit
# ---------------------------------------------------------------------------

# Fixed symmetric grid q = floor(x * 64) + 128 clamped to [0, 255]
# (range [-2, 2), step 1/64).  Both the scale (64) and the error
# quantum (2^20) are powers of two, so x*64, (q-128)/64 and
# |x - dq| * 2^20 are all EXACT in binary floating point: the per-row
# integers are engine-independent and their sums are exact BIGINTs —
# no float-sum drift in the oracle comparison.
_Q_SCALE = 64
_Q_ERR = 1 << 20


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization audit over the embedding corpus: for each of
    the 64 dimensions, how many values clip outside the fixed
    [-2, 2) grid, the quantized min/max, and the total reconstruction
    error in exact 2^-20 quanta.  This is the go/no-go table a
    100 TB embedding-compression pass produces before committing to a
    quantized index (IVF/PQ serve from int8; see ann_pq_topk).

    Scale shape: ``posexplode`` fans each row into 64 (dim, value)
    pairs and the groupBy(dim) aggregate is map-side combinable down
    to 64 rows per input partition — the single shuffle moves
    O(64 × partitions) rows regardless of corpus size.  All
    arithmetic is whole-stage codegen; no Python anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    qraw = F.floor(F.col("x") * _Q_SCALE) + 128
    q = F.greatest(F.lit(0).cast("long"), F.least(F.lit(255).cast("long"), qraw))
    dq = (q - 128).cast("double") / _Q_SCALE
    scored = ex.select(
        (F.col("pos") + 1).alias("dim"),
        qraw.alias("qraw"),
        q.alias("q"),
        F.floor(F.abs(F.col("x") - dq) * _Q_ERR).alias("err_q"),
    )
    return (
        scored.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when((F.col("qraw") < 0) | (F.col("qraw") > 255), 1).otherwise(0)).alias(
                "n_clipped"
            ),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.sum("err_q").alias("sum_err_q20"),
        )
        .orderBy("dim")
    )


_ORACLE_QUANT = f"""
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
s AS (
  SELECT dim,
         CAST(floor(x * {_Q_SCALE}) AS BIGINT) + 128 AS qraw,
         greatest(0, least(255, CAST(floor(x * {_Q_SCALE}) AS BIGINT) + 128)) AS q,
         x
  FROM ex)
SELECT dim, count(*) AS n,
       CAST(sum(CASE WHEN qraw < 0 OR qraw > 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       min(q) AS min_q, max(q) AS max_q,
       CAST(sum(CAST(floor(abs(x - (q - 128) / {_Q_SCALE}.0) * {_Q_ERR}) AS BIGINT)) AS BIGINT)
         AS sum_err_q20
FROM s GROUP BY dim ORDER BY dim
"""


# ---------------------------------------------------------------------------
# supplier_affinity_cn — common-neighbor link prediction, bucketed
# ---------------------------------------------------------------------------

# Parts shared by more suppliers than this cap are skew hubs: they
# contribute O(deg^2) candidate pairs while carrying almost no signal
# (a part everyone supplies predicts nothing).  Capping is the
# standard common-neighbor scale guard (same role as the LSH band
# caps in dedup.py) and is mirrored verbatim in the oracle.
_CN_DEG_CAP = 64


def q_supplier_affinity_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by common-neighbor count on the
    part–supplier bipartite graph (distinct (part, supplier) edges
    from lineitem): suppliers sharing many parts are interchangeable
    sources — the link-prediction primitive behind substitution and
    dedup-by-catalog at 100 TB.

    Scale shape: candidate pairs are generated PER SHARED PART
    (bucket join of the edge list with itself on l_partkey), never
    supplier × supplier; parts above ``_CN_DEG_CAP`` suppliers are
    dropped before pairing, bounding the fanout of any one key at
    O(cap²).  One shuffle builds the distinct edge list, one
    co-partitioned self-join fans pairs, one map-side-combinable
    groupBy counts them; top-20 is TakeOrdered (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    deg = edges.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("deg"))
    kept = edges.join(deg.where(F.col("deg") <= _CN_DEG_CAP), "l_partkey")
    # Materialize the capped edge list ONCE in part-key layout: it
    # feeds both sides of the self-join, and across AQE stage
    # boundaries Catalyst does not ReusedExchange the two identical
    # subtrees (same failure mode as dup_ngram_spans) — without this
    # the distinct+degree-join pipeline runs twice.  The checkpointed
    # layout also makes the self-join exchange-free.
    kept = kept.repartition(F.col("l_partkey")).localCheckpoint(eager=True)
    a = kept.select("l_partkey", F.col("l_suppkey").alias("s1"))
    b = kept.select("l_partkey", F.col("l_suppkey").alias("s2"))
    pairs = a.join(b, "l_partkey").where(F.col("s1") < F.col("s2"))
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("common_parts"))
        .orderBy(F.desc("common_parts"), "s1", "s2")
        .limit(20)
    )


_ORACLE_CN = f"""
WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
deg AS (SELECT l_partkey, count(*) AS deg FROM edges GROUP BY 1),
kept AS (SELECT e.l_partkey, e.l_suppkey FROM edges e
         JOIN deg USING (l_partkey) WHERE deg <= {_CN_DEG_CAP})
SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS common_parts
FROM kept a JOIN kept b
  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
GROUP BY 1, 2
ORDER BY common_parts DESC, s1, s2 LIMIT 20
"""


# ---------------------------------------------------------------------------
# ngram_novelty — per-source distinct-trigram novelty profile
# ---------------------------------------------------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty profile per (source, lang): for each document, the
    share of its DISTINCT word-trigrams that appear in no other
    document, as exact integer basis points; sources whose documents
    are mostly recombinations of corpus-common trigrams (low
    novelty) are prime dedup/downweight candidates in a training-data
    mix.  Complements dup_ngram_spans (which counts repeated SPANS
    per doc): novelty is distinct-gram-based, so a document repeating
    its own phrase is not penalized — only cross-document sharing is.

    Scale shape: trigram construction is pure codegen array HOFs
    (transform over sequence); the (doc, gram) pairs are distinct per
    doc before the gram-count shuffle, so a hot phrase inside one doc
    contributes one row.  Two shuffles total (gram → doc-count, gram
    join back), then a map-side-combinable per-source rollup.
    Integer outputs only — no float drift."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        "lang",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("t"),
    )
    grams = toks.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN array_distinct(transform("
                "  sequence(1, size(t) - 2),"
                "  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),"
                "                 element_at(t, i + 2))))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    gd = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        grams.join(gd, "gram")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty_bp", F.expr("CAST(10000 * n_novel DIV n_grams AS BIGINT)")
        )
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("novelty_bp").alias("sum_novelty_bp"),
            F.min("novelty_bp").alias("min_novelty_bp"),
            F.max("novelty_bp").alias("max_novelty_bp"),
        )
        .orderBy("source", "lang")
    )


_ORACLE_NOVELTY = """
WITH toks AS (
  SELECT doc_id, source, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
g AS (
  SELECT DISTINCT doc_id, source, lang,
         array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS r(i)
  WHERE len(t) >= 3),
gd AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, g.source, g.lang, count(*) AS n_grams,
         sum(CASE WHEN gd.n_docs = 1 THEN 1 ELSE 0 END) AS n_novel
  FROM g JOIN gd USING (gram) GROUP BY 1, 2, 3),
bp AS (
  SELECT source, lang, (10000 * n_novel) // n_grams AS novelty_bp
  FROM per_doc)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(novelty_bp) AS BIGINT) AS sum_novelty_bp,
       CAST(min(novelty_bp) AS BIGINT) AS min_novelty_bp,
       CAST(max(novelty_bp) AS BIGINT) AS max_novelty_bp
FROM bp GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# pareto_frontier — distributed 2-D skyline
# ---------------------------------------------------------------------------


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of the part catalog: parts not dominated under
    (maximize p_retailprice, minimize p_size) — no other part is
    (>= price, <= size) with at least one strict.  The skyline is the
    classic multi-objective shortlist (cheapest-big vs priciest-small
    trade-off curve).

    Scale shape: dominance never needs a pairwise join — a part is on
    the frontier iff (a) its price equals the MAX price of its size
    class and (b) every strictly smaller size class has a strictly
    lower max price.  So: one map-side-combinable groupBy(p_size)
    reduces the data to |distinct sizes| rows (a bounded attribute
    domain — 50 here; the same bounded-key argument as
    equidepth_histogram), a prefix max over that tiny frame computes
    (b), and a broadcast join back tags frontier rows in one pass
    over the table.  The only window runs over the size-class frame,
    never the data."""
    part = load_table(spark, sf_dir, "part")
    sizes = (
        part.groupBy(F.col("p_size").alias("sz"))
        .agg(F.max("p_retailprice").alias("mp"))
    )
    w = Window.orderBy("sz").rowsBetween(Window.unboundedPreceding, -1)
    marked = sizes.withColumn("prior_max", F.max("mp").over(w)).where(
        F.col("prior_max").isNull() | (F.col("prior_max") < F.col("mp"))
    )
    return (
        part.join(
            F.broadcast(marked),
            (F.col("p_size") == F.col("sz")) & (F.col("p_retailprice") == F.col("mp")),
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    )


_ORACLE_PARETO = """
WITH sizes AS (
  SELECT p_size, max(p_retailprice) AS mp FROM part GROUP BY 1),
marked AS (
  SELECT p_size, mp,
         max(mp) OVER (ORDER BY p_size
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_max
  FROM sizes)
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p JOIN marked m
  ON p.p_size = m.p_size AND p.p_retailprice = m.mp
WHERE m.prior_max IS NULL OR m.prior_max < m.mp
ORDER BY p.p_size, p.p_partkey
"""


QUERIES["embedding_quantize_int8"] = q_embedding_quantize_int8
ORACLES["embedding_quantize_int8"] = _ORACLE_QUANT
QUERIES["supplier_affinity_cn"] = q_supplier_affinity_cn
ORACLES["supplier_affinity_cn"] = _ORACLE_CN
QUERIES["ngram_novelty"] = q_ngram_novelty
ORACLES["ngram_novelty"] = _ORACLE_NOVELTY
QUERIES["pareto_frontier"] = q_pareto_frontier
ORACLES["pareto_frontier"] = _ORACLE_PARETO


# ---------------------------------------------------------------------------
# lpa_communities — synchronous label propagation on the part–supplier graph
# ---------------------------------------------------------------------------

_LPA_ITERS = 4


def _lpa_oracle_iteration(i: int) -> str:
    """One unrolled sync-LPA step: neighbor labels + own label,
    mode per node with smallest-label tie-break."""
    return f"""
s{i} AS (SELECT e.dst AS node, l.lab FROM edges e JOIN l{i - 1} l ON e.src = l.node
         UNION ALL SELECT node, lab FROM l{i - 1}),
c{i} AS (SELECT node, lab, count(*) AS cnt FROM s{i} GROUP BY 1, 2),
l{i} AS (SELECT node, lab FROM (
   SELECT node, lab, row_number() OVER (PARTITION BY node
                                        ORDER BY cnt DESC, lab) AS rn
   FROM c{i}) WHERE rn = 1)"""


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the undirected supplier↔part graph
    (pagerank_bipartite's edge set) via 4 synchronous label-propagation
    steps — the third iterative-graph family next to PageRank and the
    LSSS connected components, and a different fixed point: LPA finds
    densely-connected CLUSTERS (catalog segments), components find
    reachability.  Each node's own label rides the neighbor stream, so
    the bipartite 2-cycle oscillation is damped and the step stays
    deterministic (mode, ties to the smallest label).  Output: the 20
    largest communities as exact integer sizes.

    Scale shape (operators/communities.py): edges are laid out ONCE
    in a partitioning-preserving cache; at this |V| the label frame
    rides a broadcast (gated at 5M nodes), so each step is a
    map-side join + two layout-reusing aggregations with ZERO
    per-step shuffles; past the gate it degrades to the honest
    |V|+|E| per-step exchange.  Lineage truncated every 2 steps."""
    from ..operators.communities import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 1000000000000).alias("dst"),
    ).distinct()
    edges = sp.union(sp.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labs = label_propagation(
        edges, iterations=_LPA_ITERS, shuffle_partitions=8
    )
    return (
        labs.groupBy(F.col("community"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), "community")
        .limit(20)
    )


_ORACLE_LPA = (
    """
WITH sp AS (SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000000000 AS dst
            FROM lineitem),
edges AS (SELECT src, dst FROM sp UNION ALL SELECT dst, src FROM sp),
nodes AS (SELECT DISTINCT src AS node FROM edges),
l0 AS (SELECT node, node AS lab FROM nodes),"""
    + ",".join(_lpa_oracle_iteration(i) for i in range(1, _LPA_ITERS + 1))
    + f"""
SELECT lab AS community, count(*) AS size
FROM l{_LPA_ITERS} GROUP BY 1 ORDER BY size DESC, community LIMIT 20
"""
)

QUERIES["lpa_communities"] = q_lpa_communities
ORACLES["lpa_communities"] = _ORACLE_LPA


# ---------------------------------------------------------------------------
# jq_recursive_update — path-tracked `..` update through the UDTF tier
# ---------------------------------------------------------------------------


def q_jq_recursive_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive path update end-to-end: the jq program
    ``(.. | numbers) |= . * 2 + 1`` rewrites every number anywhere in
    the document via path-tracked ``recurse`` (the r7 NATIVE_PATH
    family — jq's `walk`-free idiom for deep numeric edits), then
    projects the updated field.  Runs on the Python UDTF tier
    (`native="never"` — this is an ENGINE correctness probe, like the
    flagship) and aggregates per event_type.  Corrupt props rows ride
    the `$error` substitution channel and surface as NULLs, exactly
    like the oracle's failed json_extract casts."""
    from ..udtf import jq_explode

    events = load_table(spark, sf_dir, "events")
    x = jq_explode(
        events,
        "props",
        "(.. | numbers) |= . * 2 + 1 | {k2: .k}",
        "k2:int",
        native="never",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k2").alias("sum_k2"),
            F.min("k2").alias("min_k2"),
            F.max("k2").alias("max_k2"),
        )
        .orderBy("event_type")
    )


_ORACLE_JQ_RECURSIVE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 + 1) AS BIGINT) AS sum_k2,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 + 1) AS INTEGER) AS min_k2,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 + 1) AS INTEGER) AS max_k2
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["jq_recursive_update"] = q_jq_recursive_update
ORACLES["jq_recursive_update"] = _ORACLE_JQ_RECURSIVE
