"""Independent reference checks for the statistics wave: the DuckDB
oracle only proves Spark and DuckDB agree — these tests recompute the
statistics from first principles in pure Python/numpy on the sf0.001
tables and compare against the ORACLE result, so a formula error
shared by both SQL formulations cannot hide.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "customer", "events"]:
        c.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


def oracle(con, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    return con.execute(e.oracle_sql()[name]).fetchall()


def segment_prices(con):
    rows = con.execute(
        """SELECT c.c_mktsegment, o.o_totalprice
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    ).fetchall()
    a = np.array([p for s, p in rows if s == "BUILDING"])
    b = np.array([p for s, p in rows if s == "MACHINERY"])
    return a, b


def test_ks_two_sample_matches_bruteforce(con):
    a, b = segment_prices(con)
    # brute-force ECDF over the union of observed values
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = float(np.max(np.abs(fa - fb)))
    (na, nb, ks) = oracle(con, "ks_two_sample")[0]
    assert (na, nb) == (len(a), len(b))
    assert abs(ks - round(d, 6)) <= 1e-6


def test_mannwhitney_matches_bruteforce(con):
    a, b = segment_prices(con)
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    # average ranks over ties
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of 1-based ranks i+1..j
        i = j
    r1 = float(ranks[: len(a)].sum())
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie-corrected variance
    _, counts = np.unique(allv, return_counts=True)
    tie3 = float((counts.astype(float) ** 3 - counts).sum())
    n = n1 + n2
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(sigma2)
    (on1, on2, ou, oz) = oracle(con, "mannwhitney_u")[0]
    assert (on1, on2) == (n1, n2)
    assert abs(ou - round(u1, 4)) <= 1e-4
    assert abs(oz - round(z, 6)) <= 1e-5


def test_kaplan_meier_matches_bruteforce(con):
    rows = con.execute(
        """SELECT date_diff('day', min(o_orderdate), max(o_orderdate)) AS dur,
                  max(o_orderdate) AS last_o
           FROM orders GROUP BY o_custkey"""
    ).fetchall()
    data_end = max(r[1] for r in rows)
    import datetime

    cutoff = data_end - datetime.timedelta(days=180)
    pts = [(r[0], 1 if r[1] < cutoff else 0) for r in rows]
    total = len(pts)
    # group by duration
    from collections import Counter

    d_events = Counter(d for d, o in pts if o)
    all_t = Counter(d for d, o in pts)
    surv = 1.0
    expect = {}
    n_risk = total
    for t in sorted(all_t):
        d = d_events.get(t, 0)
        if d > 0:
            surv *= 1.0 - d / n_risk
            expect[t] = (n_risk, d, surv)
        n_risk -= all_t[t]
    got = {r[0]: (r[1], r[2], r[4]) for r in oracle(con, "kaplan_meier")}
    assert set(got) == set(expect)
    for t, (nr, d, s) in expect.items():
        gnr, gd, gs = got[t]
        assert (gnr, gd) == (nr, d), t
        assert abs(gs - round(s, 6)) <= 2e-6, t


def test_theil_sen_matches_bruteforce(con):
    rows = con.execute(
        """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS y
           FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for et, day, y in rows:
        series[et].append(float(y))
    expect = {}
    for et, ys in series.items():
        xs = list(range(1, len(ys) + 1))
        slopes = sorted(
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        m = float(np.percentile(slopes, 50, method="linear"))
        inter = float(np.percentile([y - m * x for x, y in zip(xs, ys)], 50, method="linear"))
        expect[et] = (len(ys), round(m, 6), round(inter, 4))
    got = {r[0]: (r[1], r[2], r[3]) for r in oracle(con, "theil_sen_trend")}
    assert got == expect


def test_benford_expected_sums_to_n(con):
    rows = oracle(con, "benford_deviation")
    n = sum(r[1] for r in rows)
    total_expected = sum(r[2] for r in rows)
    # Benford probabilities over digits 1..9 sum to 1 exactly
    assert set(r[0] for r in rows) <= set(range(1, 10))
    assert abs(total_expected - n) < 0.1
