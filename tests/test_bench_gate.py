"""Unit tests for bench.py's probe-gate decision logic (VERDICT r12
#7): the quarantine machinery is load-bearing for every cross-round
comparison, so its keep/retry decisions are pinned here WITHOUT a
SparkSession — `gate_suspects` / `gate_retry` are pure functions over
simulated probe series."""

from __future__ import annotations

import importlib.util
import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(_here, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

SPIKE = 0.5  # threshold for all cases below


def test_suspects_bracket_spike_and_warm_anomaly():
    timings = {"a": 1.0, "b": 2.0, "c": 3.0, "d": 4.0, "e": -1.0}
    cold = {"a": 1.0, "b": 2.0, "c": 1.0, "d": 4.0, "e": 1.0}
    probe = {
        "a": [0.1, 0.1],  # clean, warm == cold -> not suspect
        "b": [0.1, 0.9],  # bracket spiked -> suspect
        "c": [0.1, 0.1],  # clean bracket BUT warm 3x cold -> suspect
        "d": [0.1, 0.1],  # clean, warm == cold -> not suspect
        "e": [0.9, 0.9],  # failed query -> never retried
    }
    out = bench.gate_suspects(timings, cold, probe, SPIKE)
    # most expensive first so the retry budget goes where it matters
    assert out == ["c", "b"]


def test_suspects_warm_anomaly_needs_absolute_floor():
    # warm > 1.5x cold but under the 1.0 s absolute floor -> scheduler
    # jitter, not a stall; never suspect
    timings = {"a": 0.9}
    cold = {"a": 0.2}
    assert bench.gate_suspects(timings, cold, {"a": [0.1, 0.1]}, SPIKE) == []


def test_retry_keeps_min_across_attempts():
    seq = iter([(5.0, 0.1, 0.9), (2.0, 0.1, 0.1)])
    kept, attempts, clean, extra, kept_spiked = bench.gate_retry(
        lambda: next(seq),
        first=9.0,
        first_bracket=[0.1, 0.9],
        spike_thr=SPIKE,
        deadline=float("inf"),
    )
    assert kept == 2.0
    assert attempts == [9.0, 5.0, 2.0]
    assert clean is True  # second retry's bracket was clean
    assert extra == [0.1, 0.9, 0.1, 0.1]
    assert kept_spiked is False  # the kept attempt IS the clean one


def test_retry_stops_early_on_clean_bracket():
    calls = []

    def measure():
        calls.append(1)
        return (1.2, 0.1, 0.1)  # clean bracket immediately

    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        measure, 3.0, [0.9, 0.1], SPIKE, float("inf")
    )
    assert len(calls) == 1  # stopped after the first clean retry
    assert kept == 1.2 and clean is True and kept_spiked is False


def test_retry_all_attempts_spiked_is_still_suspect():
    # ADVICE r12: a persistently stalled host must be flagged, not
    # silently kept — clean_seen False -> still_suspect in the artifact
    seq = iter([(5.0, 0.9, 0.9), (6.0, 0.9, 0.9)])
    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        lambda: next(seq), 7.0, [0.9, 0.9], SPIKE, float("inf")
    )
    assert kept == 5.0  # min is still the least contaminated sample
    assert len(attempts) == 3
    assert clean is False
    assert kept_spiked is True


def test_retry_budget_exhausted_keeps_first_and_flags():
    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        lambda: (_ for _ in ()).throw(AssertionError("not called")),
        4.0,
        [0.9, 0.9],
        SPIKE,
        deadline=0.0,  # already past the budget
    )
    assert kept == 4.0 and attempts == [4.0] and clean is False
    assert kept_spiked is True


def test_retry_warm_anomaly_with_clean_original_bracket():
    # suspect came from the warm>1.5x-cold signal; the ORIGINAL
    # bracket was clean, so even a spiked retry leaves clean_seen True
    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        lambda: (1.0, 0.9, 0.9), 3.0, [0.1, 0.1], SPIKE, float("inf")
    )
    assert clean is True
    assert kept == 1.0
    # the KEPT draw (the retry) sat in a spiked window even though the
    # original's bracket was clean -> flagged (VERDICT r13 #2)
    assert kept_spiked is True


def test_retry_measure_failure_keeps_original():
    def boom():
        raise RuntimeError("executor lost")

    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        boom, 2.5, [0.9, 0.1], SPIKE, float("inf")
    )
    assert kept == 2.5 and attempts == [2.5] and clean is False
    assert kept_spiked is True


def test_retry_kept_from_spiked_window_flagged_despite_clean_attempt():
    """VERDICT r13 #2 (the r13 gate gap): the kept min came from a
    SPIKED window while a slower attempt's bracket was clean — the
    clean attempt must not launder the contaminated kept number."""
    seq = iter([(5.0, 0.9, 0.9), (6.0, 0.1, 0.1)])
    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        lambda: next(seq), 7.0, [0.9, 0.9], SPIKE, float("inf")
    )
    assert kept == 5.0
    assert clean is True  # attempt 3's bracket was clean
    assert kept_spiked is True  # ... but the KEPT draw's was not


def test_retry_min_tie_prefers_clean_bracket():
    # equal measurements, one from a clean window: the claim "kept ==
    # a clean-window sample" is true, so no flag
    seq = iter([(5.0, 0.1, 0.1)])
    kept, attempts, clean, _, kept_spiked = bench.gate_retry(
        lambda: next(seq), 5.0, [0.9, 0.9], SPIKE, float("inf")
    )
    assert kept == 5.0 and clean is True and kept_spiked is False


def test_kept_anomalous_is_the_persistent_stall_signal():
    """VERDICT r13 #2: jq_select_filter published 22.8 s (clean retry
    bracket, real value 0.77 s) — a stall spanning the whole
    measurement hides from edge probes; warm>1.5x-cold still fires."""
    assert bench.kept_anomalous(22.8, 0.9) is True
    assert bench.kept_anomalous(1.2, 1.1) is False  # normal warm run
    assert bench.kept_anomalous(0.9, 0.2) is False  # under the 1 s floor
    assert bench.kept_anomalous(5.0, -1.0) is False  # no cold sample
