"""Benchmark runner: times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Methodology: one warm-up execution of a trivial action to absorb JVM
startup, then each query measured as full plan → collect.  Times are
end-to-end wall-clock per query; metric is total seconds across the
suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


# --- probe-gate decision logic (pure; unit-tested without Spark in
# tests/test_bench_gate.py — VERDICT r12 #7) ---------------------------


def gate_suspects(timings, cold, query_probe, spike_thr):
    """Which queries need quarantine-and-retry, most expensive first.

    A query is SUSPECT if (a) a bracket probe spiked — the host
    observably stalled around its measurement window — or (b) warm >
    1.5x its own cold (the old steady-state-impossibility signal,
    kept because a stall can land between two clean probes).  Failed
    queries (negative sentinel) are never retried here."""
    out = []
    for name, t in timings.items():
        if t < 0:
            continue
        qp = query_probe.get(name, [])
        bracket_spiked = any(p > spike_thr for p in qp)
        c = cold.get(name, -1.0)
        warm_anomaly = c > 0 and t > max(1.0, 1.5 * c)
        if bracket_spiked or warm_anomaly:
            out.append(name)
    return sorted(out, key=lambda n: -timings[n])


def gate_retry(
    measure, first, first_bracket, spike_thr, deadline, now=time.time
):
    """Quarantine-and-retry one suspect: up to 2 re-measurements of
    ``measure() -> (sec, probe_before, probe_after)`` within the
    wall-clock ``deadline``, stopping early on a clean bracket.

    Returns (kept_sec, attempts, clean_seen, extra_brackets,
    kept_bracket_spiked): kept = min(attempts) — every attempt is a
    fully-warm plan, so the minimum is the least contaminated sample
    under intermittent stalls; clean_seen=False means NO attempt
    (original included) had a clean bracket and the kept number should
    be discounted (ADVICE r12: surfaced as the artifact's
    still_suspect list).  kept_bracket_spiked (VERDICT r13 #2) reports
    whether the bracket around the attempt that PRODUCED the kept
    number spiked — min ties prefer a clean-bracket attempt so the
    flag is never raised when an equal clean measurement exists."""
    attempts = [first]
    brackets: list[list[float]] = [list(first_bracket)]
    extra_brackets: list[float] = []
    for _ in range(2):
        if now() > deadline:
            break
        try:
            dt, p0, p1 = measure()
        except Exception:
            break
        attempts.append(dt)
        brackets.append([p0, p1])
        extra_brackets.extend([p0, p1])
        if p0 <= spike_thr and p1 <= spike_thr:
            break

    def _spiked(b: list[float]) -> bool:
        return (not b) or any(p > spike_thr for p in b)

    clean_seen = any(not _spiked(b) for b in brackets)
    kept = min(attempts)
    tie_idx = [i for i, a in enumerate(attempts) if a == kept]
    kept_bracket_spiked = all(_spiked(brackets[i]) for i in tie_idx)
    return kept, attempts, clean_seen, extra_brackets, kept_bracket_spiked


def kept_anomalous(kept: float, cold_t: float) -> bool:
    """True when a KEPT (post-retry) measurement still trips the
    warm>1.5x-cold steady-state-impossibility bar (VERDICT r13 #2: the
    r13 driver window published jq_select_filter at 22.8 s — a ~30x
    stall that lasted through the whole 22 s measurement, so the edge
    probes of the retry landed clean and no flag fired; the only
    in-run signal left is that a warmed plan cannot be slower than its
    own cold run by 1.5x on a healthy host)."""
    return cold_t > 0 and kept > max(1.0, 1.5 * cold_t)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    from hive_jq_udtf_spark.plans.queries import QUERIES

    # Shuffle/block files on tmpfs when available: local-mode stand-in
    # for the NVMe shuffle volumes a real cluster provisions.  /tmp in
    # this container is disk-backed; at toy SF the shuffle write+fsync
    # latency is part of the per-query constant floor.  Gated on
    # capacity (ADVICE r7): containers often cap /dev/shm at 64 MB,
    # and ENOSPC mid-suite is worse than a slower floor — require
    # comfortable headroom over the staged input + shuffle volume
    # (staged parquet is ~2x the input; suite-wide shuffle spill at
    # bench SFs stays well under 16x input) before leaving disk.
    import shutil as _sh
    import tempfile

    shm = None
    if os.access("/dev/shm", os.W_OK):
        try:
            input_bytes = sum(
                os.path.getsize(os.path.join(sf_dir, f))
                for f in os.listdir(sf_dir)
                if f.endswith(".parquet")
            )
            need = max(4 << 30, 32 * input_bytes)
            if _sh.disk_usage("/dev/shm").free >= need:
                shm = "/dev/shm"
        except OSError:
            shm = None
    local_dir = tempfile.mkdtemp(prefix="bench_local_", dir=shm)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-bench")
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # NOTE: no autoBroadcastJoinThreshold override — size estimates
        # on these single-row-group files are bogus and a large
        # threshold makes Spark broadcast big computed subtrees;
        # intended broadcasts are explicit broadcast() hints in the
        # query definitions
        .config("spark.driver.memory", "24g")
        # the suite compiles >100 whole-stage-codegen units; the
        # default 100-entry janino cache evicts them all between the
        # warm-up pass and the timed pass, so every timed query would
        # pay a recompile (seconds for the biggest stages)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        # keep stdout clean: the driver captures only the tail of the
        # combined output and parses the final JSON line from it
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- one-time ingest staging (VERDICT r4 #5a: reused staged sources) ---
    # The driver's testdata is ONE parquet row group per table, so every
    # JVM-side scan in the suite runs as a single task no matter how many
    # cores the host has (a row group is Spark's atomic split unit) — a
    # toy-SF artifact that cannot exist at the 100 TB design point, where
    # tables arrive as thousands of files/row groups.  Stage each table
    # once (identical values, 32k-row row groups, driver-side pyarrow),
    # and size maxPartitionBytes so the multi-row-group files actually
    # split.  Staging cost is reported in the output JSON; queries see
    # the same logical tables.
    t0 = time.time()
    staged = tempfile.mkdtemp(prefix="bench_staged_", dir=shm)
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    try:
        import pyarrow.parquet as pq

        from hive_jq_udtf_spark.sources.tables import TABLES

        for t in TABLES:
            tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
            pq.write_table(tbl, f"{staged}/{t}.parquet", row_group_size=32768)
        sf_dir = staged
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        staging_seconds = round(time.time() - t0, 3)
    except Exception as ex:
        sys.stderr.write(f"bench staging skipped: {ex}\n")
        staging_seconds = -1.0

    # --- pre-flight host-factor gate (VERDICT r12 #2) -----------------
    # A 20-oracle DuckDB subset (single-process, zero Spark) timed
    # against its committed r10-closing anchor BEFORE any measurement:
    # the ratio is a pure host-speed factor, so cross-round absolute
    # comparisons are ratio-first by construction.  The subset is the
    # 20 most expensive NON-audit oracles from the r10 closing
    # artifact (git 4f91c45:bench_full.json) — audit oracles
    # (setsim_neardup/dbscan_ivf/ann_pq_topk) are excluded because
    # their brute-force SQL dominates total time and its cost tracks
    # query redefinitions, not host speed.  Oracles missing at run
    # time (redefined/renamed) are skipped on BOTH sides of the ratio.
    # The driver's per-round call always proceeds (the artifact
    # self-describes via "preflight"); a closing run launched with
    # --require-clean aborts early when the factor exceeds 1.3 so a
    # contaminated window never overwrites the committed artifact.
    _PREFLIGHT_ANCHOR_R10 = {
        "dedup_components": 2.504,
        "minhash_neardup": 1.487,
        "dedup_components_lsss": 1.436,
        "pagerank_bipartite": 1.372,
        "semantic_dedup": 1.310,
        "kmeans_embeddings": 1.122,
        "lpa_communities": 1.057,
        "neardup_jaccard": 0.827,
        "embedding_covariance": 0.736,
        "embedding_whiten": 0.736,
        "embedding_neardup": 0.707,
        "semantic_dedup_whitened": 0.673,
        "embedding_pca_topk": 0.662,
        "simhash_neardup": 0.659,
        "containment_neardup": 0.564,
        "dup_ngram_spans": 0.554,
        "dbscan_clusters": 0.472,
        "cms_heavy_hitters": 0.465,
        "knn_eval_ivf": 0.418,
        "session_funnel_windowed": 0.392,
    }
    preflight = {"host_factor": -1.0, "anchor": "r10-close (4f91c45)"}
    try:
        import duckdb as _dk

        from hive_jq_udtf_spark.plans.queries import ORACLES as _ORC
        from hive_jq_udtf_spark.sources.tables import TABLES as _TBL

        _pc = _dk.connect()
        for _t in _TBL:
            _pc.execute(
                f"CREATE VIEW {_t} AS SELECT * FROM '{sf_dir}/{_t}.parquet'"
            )
        _now: dict[str, float] = {}
        for _n, _anchor_s in _PREFLIGHT_ANCHOR_R10.items():
            if _n not in _ORC:
                continue
            _t0 = time.time()
            try:
                _pc.execute(_ORC[_n]).fetchall()
                _now[_n] = round(time.time() - _t0, 3)
            except Exception:
                pass
        _pc.close()
        _a = sum(_PREFLIGHT_ANCHOR_R10[n] for n in _now)
        preflight = {
            "host_factor": round(sum(_now.values()) / _a, 3) if _a else -1.0,
            "subset_seconds": round(sum(_now.values()), 3),
            "anchor_seconds": round(_a, 3),
            "n_subset": len(_now),
            "per_query": _now,
            "anchor": "r10-close (4f91c45)",
            "note": (
                "sf0.1-anchored; at other SFs the factor is only a "
                "rough host signal"
            ),
        }
    except Exception as ex:
        sys.stderr.write(f"bench preflight skipped: {ex}\n")
    if "--require-clean" in sys.argv and not (
        0 < preflight["host_factor"] <= 1.3
    ):
        print(
            json.dumps(
                {
                    "metric": "suite_seconds",
                    "value": -1.0,
                    "unit": "sec",
                    "aborted_unclean_host": True,
                    "preflight": preflight,
                    "sf": sf,
                },
                separators=(",", ":"),
            )
        )
        return

    # warm-up: JVM codegen AND the Python/pandas-UDF worker pool, so
    # the first timed query doesn't absorb one-time startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    from hive_jq_udtf_spark.udtf import jq_explode

    warm = spark.createDataFrame([('{"k": 1}',)] * 256, "j string").repartition(int(cpus))
    jq_explode(warm, "j", "{k: .k}", "k:int", native="never").collect()
    # warm the dominant codegen shapes (array HOFs + joins, 60-agg
    # bit vote, window) so their JIT cost isn't attributed to the
    # first query that happens to use them
    from hive_jq_udtf_spark.operators.dedup import ngram_jaccard_pairs, simhash60_neardup_pairs

    tiny = spark.createDataFrame(
        [(i, "w%d x y z a b c" % i) for i in range(8)], "doc_id long, text string"
    )
    ngram_jaccard_pairs(tiny, n=3, threshold=0.8).collect()
    simhash60_neardup_pairs(tiny, max_hamming=3).collect()

    # Two passes: pass 1 (untimed) absorbs whole-stage-codegen JIT for
    # every plan shape at real data sizes — 10s+ of one-off Janino
    # compilation otherwise lands on arbitrary queries; pass 2 is the
    # steady-state measurement (the quantity that scales).  Cold total
    # is still reported for transparency.
    import gc

    def run_once(name, fn):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        dt = round(time.time() - t0, 3)
        # Release this query's JVM-side state (localCheckpoint RDDs,
        # broadcasts) before the next one — py4j frees them only on
        # Python GC, and accumulated blocks skew later measurements.
        df = None
        gc.collect()
        return dt

    # --draws N (VERDICT r8 #7): cold pass once, then N timed serial
    # passes (and N concurrent passes below); per-query and suite
    # numbers are the MEDIAN across draws, emitted directly so
    # BASELINE.md quotes an artifact instead of hand-assembled
    # medians.  Default stays 1 draw (the driver's per-round call).
    draws = 1
    if "--draws" in sys.argv:
        draws = max(1, int(sys.argv[sys.argv.index("--draws") + 1]))

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else round((xs[n // 2 - 1] + xs[n // 2]) / 2, 3)

    cold: dict[str, float] = {}
    for name, fn in QUERIES.items():
        try:
            cold[name] = run_once(name, fn)
        except Exception as ex:
            sys.stderr.write(f"bench {name} failed (cold): {ex}\n")
            gc.collect()

    # --- probe-gated measurement (VERDICT r11 #2) ---------------------
    # r11's serial number (432.9 s vs r10's 191.6 s on unchanged plans)
    # was host stalls: isolated re-timing showed a frozen plan swinging
    # 6-53 s between adjacent trials, and the end-of-run host_probe
    # recorded noise_ratio 5.73.  The old guard keyed remeasurement on
    # "warm > 1.5x own cold", but a stalled COLD pass legitimizes a
    # stalled warm one.  Fix: anchor a cheap fixed JVM task (the probe)
    # while the host is demonstrably clean, BRACKET every timed
    # measurement with one probe sample on each side, and
    # quarantine-and-retry any query whose bracket overlaps a probe
    # spike — the host's condition during the measurement window is
    # observed, not inferred from the query's own history.  The
    # 15-query cap is gone (a degraded host needs MORE retries, not
    # fewer); the bound is a wall-clock retry budget instead.
    def probe_once() -> float:
        t0 = time.time()
        # avg of a modulo keeps the probe ANSI-safe (sum(id * id)
        # overflows long at this row count under ANSI mode)
        spark.range(20_000_000).selectExpr("avg(id % 97)").collect()
        return round(time.time() - t0, 4)

    probe_once(), probe_once()  # JIT-warm the probe's codegen shape
    probe_anchor = sorted(probe_once() for _ in range(5))
    probe_base = probe_anchor[2]  # median of 5 clean-ish samples
    # spike = clearly outside scheduler jitter: 2.5x the anchor or an
    # absolute 0.25 s stall, whichever is larger (anchor is ~0.04 s)
    spike_thr = round(max(2.5 * probe_base, probe_base + 0.25), 4)
    probe_log: list[float] = []

    def timed_with_probe(name, fn):
        p0 = probe_once()
        probe_log.append(p0)
        dt = run_once(name, fn)
        p1 = probe_once()
        probe_log.append(p1)
        return dt, p0, p1

    # Streaming queries get ONE extra untimed run before each timed
    # measurement (VERDICT r8 #3 protocol change): a streaming query
    # cannot reuse a warmed plan across runs (fresh checkpoint + sink
    # per start), so its second-ever run still pays plan/codegen
    # amortization that batch queries shed in the cold pass — the
    # extra run times the steady-state trigger latency instead.
    # Recorded in the artifact as streaming_warm_runs.
    serial_draws: list[dict[str, float]] = []
    # ALL probe brackets for the query, in draw/retry order — 2 per
    # measurement (ADVICE r12: multi-draw runs previously overwrote
    # this with the LAST draw's bracket while timings kept the
    # median; now every measurement's bracket is recorded and
    # query_probe_ratio is the WORST instant observed around any of
    # this query's measurements)
    query_probe: dict[str, list[float]] = {}
    for d in range(draws):
        t_d: dict[str, float] = {}
        for name, fn in QUERIES.items():
            try:
                if name.startswith("stream"):
                    run_once(name, fn)
                t_d[name], p0, p1 = timed_with_probe(name, fn)
                query_probe.setdefault(name, []).extend([p0, p1])
            except Exception as ex:  # record failures as negative sentinel
                sys.stderr.write(f"bench {name} failed: {ex}\n")
                t_d[name] = -1.0
                gc.collect()
        serial_draws.append(t_d)
    timings = {
        name: (
            median([t for t in (d.get(name, -1.0) for d in serial_draws)])
            if all(d.get(name, -1.0) >= 0 for d in serial_draws)
            else -1.0
        )
        for name in QUERIES
    }

    # Quarantine-and-retry: a query is SUSPECT if (a) a bracket probe
    # spiked (host observably stalled around its window), or (b) warm >
    # 1.5x its own cold (the old steady-state-impossibility signal —
    # kept because a stall can land between two clean probes).  Each
    # suspect is re-measured, bracketed again, up to 2 times or until a
    # clean-window measurement lands; the KEPT number is the minimum
    # across attempts (the steady-state estimator under intermittent
    # stalls — every attempt is a fully-warm plan, so min is the least
    # contaminated sample, and all attempts stay in the artifact).
    # Expensive suspects retry first so the wall-clock budget goes to
    # the queries that move the suite number.
    remeasured: dict[str, list[float]] = {}
    # Queries where EVERY attempt's bracket spiked (ADVICE r12): the
    # kept min(attempts) is still the least contaminated sample, but
    # no clean-window measurement ever landed — BASELINE readers
    # should discount these numbers.
    still_suspect: list[str] = []
    # VERDICT r13 #2 (the r13 gate gap): queries whose KEPT number came
    # from a spiked window, or stayed warm-anomalous vs their own cold
    # even after retries — a clean bracket on ANOTHER attempt no longer
    # launders a contaminated kept draw.  BASELINE.md tells readers to
    # discount these rows (see also query_best_known).
    kept_contaminated: list[str] = []
    if draws == 1:
        retry_budget = 300.0  # wall-clock bound replacing the 15-query cap
        deadline = time.time() + retry_budget
        for name in gate_suspects(timings, cold, query_probe, spike_thr):
            kept, attempts, clean_seen, extra, kept_spiked = gate_retry(
                lambda _n=name: timed_with_probe(_n, QUERIES[_n]),
                timings[name],
                query_probe.get(name, []),
                spike_thr,
                deadline,
            )
            query_probe.setdefault(name, []).extend(extra)
            if len(attempts) > 1:
                remeasured[name] = attempts
                timings[name] = kept
            if not clean_seen:
                still_suspect.append(name)
            elif kept_spiked or kept_anomalous(
                timings[name], cold.get(name, -1.0)
            ):
                kept_contaminated.append(name)

    # Whole-run probe summary: the interleaved samples (2 per timed
    # query + retries) observe the host across the ENTIRE measurement
    # window, not just 7 end-of-run trials.  p95/median <= 2 is the
    # "clean round" bar (BASELINE.md quotes it); spike_count says how
    # many instants crossed the quarantine threshold.
    _pl = sorted(probe_log) or [probe_base]
    probe_gate = {
        "base_sec": probe_base,
        "anchor_trials": probe_anchor,
        "spike_threshold_sec": spike_thr,
        "interleaved_n": len(probe_log),
        "interleaved_median_sec": _pl[len(_pl) // 2],
        "interleaved_p95_sec": _pl[min(len(_pl) - 1, int(0.95 * (len(_pl) - 1)))],
        "interleaved_max_sec": _pl[-1],
        "spike_count": sum(1 for p in probe_log if p > spike_thr),
        "noise_ratio": round(
            _pl[min(len(_pl) - 1, int(0.95 * (len(_pl) - 1)))]
            / max(_pl[len(_pl) // 2], 1e-9),
            2,
        ),
    }
    # Per-query probe-normalized context (bench_full only): the WORST
    # probe instant observed around any of this query's measurements
    # (all draws + retries), as a ratio to the clean anchor — a query
    # whose ratio is ~1 was only ever measured on a clean host.
    query_probe_ratio = {
        n: round(max(ps) / max(probe_base, 1e-9), 2)
        for n, ps in query_probe.items()
    }

    # Iterative-family steady state (VERDICT r10 #3): these queries
    # run N driver-side join+agg rounds (pagerank/LPA/large-small-star/
    # k-core peel/BFS frontier/Lloyd steps/DBSCAN expansion), so ONE
    # cold pass amortizes whole-stage-codegen for only the first
    # iteration shapes — the timed pass still pays janino on later
    # iterations' plan variants (measured: pagerank 4.3 s at the
    # protocol median vs 3.0 s steady).  The artifact therefore
    # carries BOTH numbers, self-describingly: the protocol median
    # stays in "queries" (and in every headline metric — nothing is
    # replaced or inflated), and each iterative query additionally
    # runs 2 extra trials here with the LAST one recorded as its
    # steady-state sample ("trial" = its 1-indexed execution count,
    # so trial N == cold + draws timed + 2 extras).
    _ITERATIVE = [
        "pagerank_bipartite",
        "lpa_communities",
        "dedup_components",
        "dedup_components_lsss",
        "kcore",
        "bfs_hop_histogram",
        "kmeans_embeddings",
        "dbscan_clusters",
        "dbscan_ivf",
    ]
    steady_state: dict[str, dict] = {}
    for name in _ITERATIVE:
        if name not in QUERIES or timings.get(name, -1.0) < 0:
            continue
        try:
            extras = [run_once(name, QUERIES[name]) for _ in range(2)]
            steady_state[name] = {
                "sec": extras[-1],
                "trial": 1 + draws + 2,
                "extra_trials": extras,
            }
        except Exception as ex:
            sys.stderr.write(f"bench steady-state {name} failed: {ex}\n")
            gc.collect()

    cold_total = sum(cold.values())
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    stream_times = [
        t for n, t in timings.items() if n.startswith("stream") and t >= 0
    ]
    streaming_mean = (
        round(sum(stream_times) / len(stream_times), 3) if stream_times else -1.0
    )

    # Shared-session CONCURRENT pass (VERDICT r4 #5a): the serial
    # suite pays scheduler + Python-worker + stream-trigger floor once
    # per query; a real multi-tenant engine overlaps them.  Each worker
    # thread gets its own spark.newSession() (isolated SQL conf and
    # temp views — the streaming queries scope shuffle-partitions per
    # session; same executors underneath), slowest-first to avoid a
    # straggler tail.  Reported alongside, never replacing, the serial
    # metric: same queries, same session lifetime, overlap amortizes
    # the constant overhead the floor section quantifies.
    import threading
    from concurrent.futures import ThreadPoolExecutor

    tl = threading.local()

    def run_conc(item):
        name, fn = item
        s = getattr(tl, "s", None)
        if s is None:
            s = spark.newSession()
            # newSession() seeds conf from the BUILDER conf, not the
            # parent's runtime conf.set calls — re-pin everything the
            # staging section set or the concurrent scans run un-split
            s.conf.set("spark.sql.session.timeZone", "UTC")
            s.conf.set(
                "spark.sql.files.maxPartitionBytes",
                spark.conf.get("spark.sql.files.maxPartitionBytes"),
            )
            tl.s = s
        try:
            fn(s, sf_dir).collect()
        except Exception as ex:
            sys.stderr.write(f"bench concurrent {name} failed: {ex}\n")
            return name
        return None

    by_cost = sorted(
        QUERIES.items(), key=lambda kv: -timings.get(kv[0], 0.0)
    )
    conc_draws: list[float] = []
    conc_failures: list[str] = []
    for _d in range(draws):
        t0 = time.time()
        with ThreadPoolExecutor(8) as pool:
            # accumulate across draws (r10 ADVICE fix: reassigning
            # dropped earlier draws' failures from the artifact while
            # their wall-clock still fed the concurrent median)
            conc_failures.extend(
                f"draw{_d}:{r}" for r in pool.map(run_conc, by_cost) if r
            )
        conc_draws.append(round(time.time() - t0, 3))
        gc.collect()
    conc_total = median(conc_draws)

    # Irreducible per-query floor on THIS host, by query class — the
    # constant that dominates the suite-vs-DuckDB ratio at toy scale
    # and vanishes at the 100 TB design point (tools/scaling.py shows
    # 100x data costs ~1-2.6x time).  Measured warm, best of 3.
    def best3(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        return round(min(ts), 3)

    from pyspark.sql.functions import col as F_col

    # Host-noise envelope (r11): the same fixed JVM task, 7 times —
    # median is the host's speed anchor for cross-round comparison
    # (a 2x slower box doubles it) and max/median is the NOISE ratio
    # (a contended host shows multi-second stalls; the r11 mid-round
    # run measured isolated queries swinging 4-6x between adjacent
    # trials).  Self-describing: a round whose probe is inflated
    # should be compared ratio-wise, not absolute.
    probe_ts = []
    for _ in range(7):
        t0 = time.time()
        # avg of a modulo keeps the probe ANSI-safe (sum(id * id)
        # overflows long at this row count under ANSI mode)
        spark.range(20_000_000).selectExpr("avg(id % 97)").collect()
        probe_ts.append(round(time.time() - t0, 4))
    probe_sorted = sorted(probe_ts)
    host_probe = {
        "median_sec": probe_sorted[3],
        "min_sec": probe_sorted[0],
        "max_sec": probe_sorted[-1],
        "noise_ratio": round(probe_sorted[-1] / max(probe_sorted[3], 1e-9), 2),
        "trials": probe_ts,
    }

    floor_sched = best3(lambda: spark.range(1).collect())  # scheduler+py4j
    floor_shuffle = best3(
        lambda: spark.range(10000).groupBy((F_col("id") % 7)).count().collect()
    )  # one exchange
    floor_python = best3(
        lambda: jq_explode(warm.limit(32), "j", ".k", "k:int", native="never")
        .collect()
    )  # Arrow python-worker roundtrip
    n_stream = sum(1 for n in timings if n.startswith("stream"))
    floor = {
        "scheduler_sec": floor_sched,
        "one_shuffle_sec": floor_shuffle,
        "python_worker_roundtrip_sec": floor_python,
        "n_queries": len(timings),
        "n_streaming": n_stream,
        "note": (
            "~{:.0f}s of the serial suite is per-query constant overhead "
            "(scheduler+exchange floor x {} queries + ~2s trigger floor "
            "x {} streaming) plus driver-side plan build/scheduling "
            "latency, not throughput; overlapping queries (concurrent "
            "pass, 8 threads, same engine+data) runs the whole suite in "
            "{:.0f}s wall-clock. The overhead does not scale with data "
            "(see tools/scaling.py)".format(
                (floor_sched + floor_shuffle) * len(timings) + 2.0 * n_stream,
                len(timings),
                n_stream,
                conc_total,
            )
        ),
    }

    # Per-query DuckDB oracle timings on the SAME staged parquet
    # (VERDICT r5 #5: the 2x bar is per-query, so the artifact must
    # carry both columns — any query slower than 2x its own oracle is
    # mechanically listable from bench_full.json alone).  Oracle-less
    # queries (streaming-only checks etc.) are simply absent.
    oracle_seconds: dict[str, float] = {}
    try:
        import duckdb

        from hive_jq_udtf_spark.plans.queries import ORACLES
        from hive_jq_udtf_spark.sources.tables import TABLES

        ocon = duckdb.connect()
        for t in TABLES:
            ocon.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name, sql in ORACLES.items():
            t0 = time.time()
            try:
                ocon.execute(sql).fetchall()
                oracle_seconds[name] = round(time.time() - t0, 3)
            except Exception as ex:
                sys.stderr.write(f"bench oracle {name} failed: {ex}\n")
                oracle_seconds[name] = -1.0
    except Exception as ex:
        sys.stderr.write(f"bench oracle pass skipped: {ex}\n")
    oracle_total = round(sum(t for t in oracle_seconds.values() if t >= 0), 3)
    # Oracles that are DELIBERATELY brute-force audits of a smarter
    # Spark plan (the oracle materializes all pairs / exact top-k so
    # the bucketed plan has something exact to match).  Their cost
    # says nothing about engine throughput, so the suite-ratio is also
    # reported with them excluded (VERDICT r7 noise protocol).
    audit_oracles = {"setsim_neardup", "ann_pq_topk", "dbscan_ivf"}
    oracle_total_ex_audit = round(
        sum(
            t
            for n, t in oracle_seconds.items()
            if t >= 0 and n not in audit_oracles
        ),
        3,
    )
    over_2x = sorted(
        n
        for n, t in timings.items()
        if t >= 0 and oracle_seconds.get(n, -1.0) > 0 and t > 2 * oracle_seconds[n]
    )

    # Floor-adjusted per-query ratio (VERDICT r12 #3): the raw 2x-vs-
    # oracle column is dominated by Spark's per-query CONSTANT floor
    # (scheduler + one exchange, ~0.1-0.7 s on these hosts) against
    # DuckDB medians of 10-100 ms — an artifact of toy SF, flat at the
    # 100 TB design point (tools/scaling.py).  Publish
    # (t_query - floor) / oracle with the floor taken from THIS run's
    # own floor block (scheduler + one shuffle; the Python-worker
    # roundtrip is NOT subtracted — only Python-tier probes pay it and
    # they are deliberate), clamped at 0, so the gate measures
    # throughput rather than scheduling.
    _floor_const = floor["scheduler_sec"] + floor["one_shuffle_sec"]
    query_ratio_floor_adj = {
        n: round(max(0.0, t - _floor_const) / oracle_seconds[n], 2)
        for n, t in timings.items()
        if t >= 0 and oracle_seconds.get(n, -1.0) > 0
    }
    over_2x_floor_adj = sorted(
        n for n, r in query_ratio_floor_adj.items() if r > 2
    )

    # Self-defending artifact (VERDICT r13 #6): merge this run's
    # CLEAN-window measurements into a committed per-round best-known
    # table (BEST_KNOWN.json at the repo root, reset by the builder at
    # round start), and embed the merged table next to the live
    # numbers — a reader of a contaminated driver window (r13: 357 s
    # published vs the real 260 s) can discount it from the artifact
    # alone.  A query qualifies when every probe around its
    # measurements stayed under the spike threshold AND it was not
    # flagged by the kept-draw gate; only the default sf0.1 merges.
    here = os.path.dirname(os.path.abspath(__file__))
    best_known_path = os.path.join(here, "BEST_KNOWN.json")
    query_best_known: dict[str, float] = {}
    try:
        with open(best_known_path) as fh:
            query_best_known = {
                k: float(v) for k, v in json.load(fh).get("queries", {}).items()
            }
    except Exception:
        pass
    try:
        _sf_num = float(sf)
    except ValueError:
        _sf_num = -1.0
    if abs(_sf_num - 0.1) < 1e-9:
        flagged = set(still_suspect) | set(kept_contaminated)
        for n, t in timings.items():
            ps = query_probe.get(n, [])
            clean = bool(ps) and all(p <= spike_thr for p in ps)
            if t >= 0 and clean and n not in flagged:
                prev = query_best_known.get(n)
                if prev is None or t < prev:
                    query_best_known[n] = t
        try:
            with open(best_known_path, "w") as fh:
                json.dump(
                    {
                        "note": (
                            "min CLEAN-bracket measurement per query this "
                            "round (bench.py merges each clean run; builder "
                            "resets at round start) — the discount table "
                            "for contaminated windows"
                        ),
                        "queries": {
                            k: query_best_known[k]
                            for k in sorted(query_best_known)
                        },
                    },
                    fh,
                    indent=1,
                )
        except Exception as ex:
            sys.stderr.write(f"bench best-known write skipped: {ex}\n")

    # --- per-query core-scaling evidence (VERDICT r14 #7) -------------
    # Re-run the 20 slowest non-streaming queries of the timed pass at
    # a LOW core count in a fresh session (same process, same staged
    # data, JVM/janino caches warm): cores_scaling.per_query[name] =
    # t(low)/t(main) — well above 1 means the query parallelizes
    # (losing cores costs time), ~1 means per-query fixed cost.
    # Additions-only: the headline value/queries and their methodology
    # are untouched, this pass runs AFTER every timed measurement.
    # Skipped when the main run is already low-core (the driver's own
    # SPARK_GRAFT_CPUS=8 scaling call) so that run isn't double-paying.
    cores_scaling: dict = {}
    if int(cpus) >= 16:
        try:
            cpus_low = max(4, int(cpus) // 4)
            top = [
                n
                for n, t in sorted(timings.items(), key=lambda kv: -kv[1])
                if t >= 0 and not n.startswith("stream")
            ][:20]
            spark.stop()
            spark_low = (
                SparkSession.builder.master(f"local[{cpus_low}]")
                .appName("spark-graft-bench-cscale")
                .config("spark.local.dir", local_dir)
                .config(
                    "spark.sql.shuffle.partitions",
                    str(max(cpus_low * 2, 16)),
                )
                .config("spark.sql.adaptive.enabled", "true")
                .config(
                    "spark.sql.adaptive.coalescePartitions.enabled", "true"
                )
                .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                .config(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", "50000"
                )
                .config("spark.driver.memory", "24g")
                .config("spark.sql.codegen.cache.maxEntries", "2000")
                .config("spark.ui.enabled", "false")
                .config("spark.ui.showConsoleProgress", "false")
                .config("spark.sql.session.timeZone", "UTC")
                .getOrCreate()
            )
            spark_low.sparkContext.setLogLevel("ERROR")
            if staging_seconds >= 0:
                spark_low.conf.set(
                    "spark.sql.files.maxPartitionBytes", str(1 << 20)
                )
            cs_per_query: dict[str, float] = {}
            for n in top:
                try:
                    t0 = time.time()
                    df = QUERIES[n](spark_low, sf_dir)
                    df.collect()
                    dt = round(time.time() - t0, 3)
                    df = None
                    gc.collect()
                    cs_per_query[n] = (
                        round(dt / timings[n], 2) if timings[n] > 0 else -1.0
                    )
                except Exception as ex:
                    sys.stderr.write(f"bench cscale {n} failed: {ex}\n")
                    cs_per_query[n] = -1.0
            spark_low.stop()
            ratios = sorted(v for v in cs_per_query.values() if v > 0)
            cores_scaling = {
                "cpus_low": cpus_low,
                "note": (
                    "t(low cores)/t(main cores) per top-20 non-streaming"
                    " query, one fresh-plan run each in a low-core"
                    " session after all timed passes (JVM warm);"
                    " >1 = parallel, ~1 = per-query fixed cost"
                ),
                "median_ratio": (
                    ratios[len(ratios) // 2] if ratios else -1.0
                ),
                "per_query": cs_per_query,
            }
        except Exception as ex:
            sys.stderr.write(f"bench cores-scaling pass skipped: {ex}\n")

    full = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "oracle_seconds": oracle_seconds,
        "oracle_suite_seconds": oracle_total,
        "oracle_suite_seconds_ex_audit": oracle_total_ex_audit,
        "local_dir_fs": "tmpfs" if shm else "disk",
        "n_over_2x_oracle": len(over_2x),
        "over_2x_oracle": over_2x,
        "query_ratio_floor_adj": query_ratio_floor_adj,
        "n_over_2x_floor_adj": len(over_2x_floor_adj),
        "over_2x_floor_adj": over_2x_floor_adj,
        "preflight": preflight,
        # ratio-first cross-round table (VERDICT r12 #2): per query,
        # [spark_sec, oracle_sec, worst probe ratio around its
        # measurements] — everything a cross-round comparison needs
        # without re-deriving from three separate dicts
        "query_table": {
            n: [
                t,
                oracle_seconds.get(n, -1.0),
                query_probe_ratio.get(n, -1.0),
            ]
            for n, t in timings.items()
        },
        "sf": sf,
        "cpus": int(cpus),
        "cold_suite_seconds": round(cold_total, 3),
        "staging_seconds": staging_seconds,
        "concurrent_suite_seconds": conc_total,
        "concurrent_threads": 8,
        "concurrent_failures": conc_failures,
        "remeasured": remeasured,
        "still_suspect": still_suspect,
        "kept_contaminated": kept_contaminated,
        "query_best_known": {
            k: query_best_known[k] for k in sorted(query_best_known)
        },
        "best_known_total": round(
            sum(query_best_known.values()), 3
        ),
        "floor": floor,
        "host_probe": host_probe,
        "probe_gate": probe_gate,
        "query_probe": query_probe,
        "query_probe_ratio": query_probe_ratio,
        "draws": draws,
        "serial_draw_totals": [
            round(sum(t for t in d.values() if t >= 0), 3) for d in serial_draws
        ],
        "concurrent_draw_totals": conc_draws,
        "cores_scaling": cores_scaling,
        "streaming_mean_sec": streaming_mean,
        "streaming_warm_runs": 2,
        "steady_state_queries": steady_state,
        "steady_state_note": (
            "iterative-family second look (VERDICT r10 #3): sec is the "
            "LAST of 2 extra trials run after the timed pass (trial = "
            "1-indexed execution count: 1 cold + draws timed + 2 extra); "
            "headline metrics use the protocol median only"
        ),
    }
    # Full per-query detail on disk (BASELINE.md points here); the
    # stdout line must stay under the harness's ~2k-char tail capture
    # or it records parsed:null (happened in round 2 when the suite
    # passed 75 queries).  Slowest queries are reported individually,
    # the fast remainder is aggregated.
    with open(os.path.join(here, "bench_full.json"), "w") as fh:
        json.dump(full, fh, indent=1)

    budget = 1600
    # stdout line: big per-query dicts shrink to the slowest queries
    # (with their oracle column) + counts; bench_full.json keeps all
    line_base = {
        **full,
        "over_2x_oracle": len(over_2x),
        "remeasured": len(remeasured),
        "still_suspect": len(still_suspect),
        "kept_contaminated": len(kept_contaminated),
        # stdout carries only the family total; bench_full.json has
        # the per-query steady-state detail + protocol note
        "steady_state_queries": len(steady_state),
        "steady_state_sum_sec": round(
            sum(v["sec"] for v in steady_state.values()), 2
        ),
        "host_probe": {
            "median_sec": host_probe["median_sec"],
            "noise_ratio": host_probe["noise_ratio"],
        },
        "probe_gate": {
            "base_sec": probe_gate["base_sec"],
            "noise_ratio": probe_gate["noise_ratio"],
            "spike_count": probe_gate["spike_count"],
        },
    }
    if cores_scaling:
        # stdout carries the summary; bench_full.json has per_query
        line_base["cores_scaling"] = {
            "cpus_low": cores_scaling["cpus_low"],
            "median_ratio": cores_scaling["median_ratio"],
            "n": len(cores_scaling["per_query"]),
        }
    else:
        del line_base["cores_scaling"]
    del line_base["steady_state_note"]
    del line_base["query_probe"]
    del line_base["query_probe_ratio"]
    del line_base["query_ratio_floor_adj"]
    del line_base["query_table"]
    del line_base["query_best_known"]
    line_base["over_2x_floor_adj"] = len(over_2x_floor_adj)
    line_base["preflight"] = {
        "host_factor": preflight.get("host_factor", -1.0)
    }
    # failures (negative sentinel) always make the line, then slowest-first
    ordered = sorted(timings.items(), key=lambda kv: (kv[1] >= 0, -abs(kv[1])))
    shown: dict[str, float] = {}
    shown_oracle: dict[str, float] = {}
    base_len = len(
        json.dumps(
            {
                **line_base,
                "queries": {},
                "oracle_seconds": {},
                "n_queries": len(timings),
                "other_sum": 0.0,
            },
            separators=(",", ":"),
        )
    )
    used = base_len
    for name, t in ordered:
        o = oracle_seconds.get(name)
        entry = 2 * (len(name) + len(f'"":{t:.2f},'))
        if used + entry > budget:
            break
        shown[name] = round(t, 2)
        if o is not None:
            shown_oracle[name] = round(o, 2)
        used += entry
    rest = [t for n, t in timings.items() if n not in shown and t >= 0]
    line = {
        **line_base,
        "queries": shown,
        "oracle_seconds": shown_oracle,
        "n_queries": len(timings),
        "other_sum": round(sum(rest), 2),
    }
    print(json.dumps(line, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
