"""Unit tests for bench.py's timing discipline — the graded numbers'
provenance. Protects the VERDICT r5 task 1 contract: every recorded
number is a MEDIAN of warm reps, timeouts are flagged lower-bounds (never
silent measurements), and rep loops respect the global budget so an
external harness kill can't lose the JSON line."""

from __future__ import annotations

import bench


def test_median_reps_returns_median_and_raw(monkeypatch):
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    deltas = iter([0.3, 0.1, 0.2])  # per-rep durations
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:  # end-of-rep reading
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(lambda: None, warm_s=0.1)
    assert raw == [0.3, 0.1, 0.2]
    assert med == 0.2  # median, not best-of


def test_median_reps_slow_query_gets_two_reps(monkeypatch):
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    ran = {"n": 0}

    def run():
        ran["n"] += 1

    med, raw = bench._median_reps(run, warm_s=bench.SLOW_QUERY_CUTOFF_S + 1)
    assert ran["n"] == 2
    assert len(raw) == 2


def test_median_reps_stops_when_budget_cannot_absorb_another_rep(monkeypatch):
    ran = {"n": 0}

    def run():
        ran["n"] += 1

    monkeypatch.setattr(bench, "remaining", lambda: 5.0)
    med, raw = bench._median_reps(run, warm_s=0.1, n_reps=3)
    # rep 1 always runs (a number is owed); reps 2-3 skipped on budget
    assert ran["n"] == 1
    assert len(raw) == 1


def test_oracle_rep_count_tiers():
    """Round-8 tier: oracles past the 20 s warm cutoff get ONE timed rep
    (50-100x Spark blowouts where extra reps cost ~70 s of budget for
    no ratio precision); the 5 s slow tier and the 3-rep default stand."""
    assert bench._oracle_rep_count(0.5) == 3
    assert bench._oracle_rep_count(bench.SLOW_QUERY_CUTOFF_S + 0.1) == 2
    assert bench._oracle_rep_count(bench.VERY_SLOW_ORACLE_S) == 2  # boundary: not yet very-slow
    assert bench._oracle_rep_count(bench.VERY_SLOW_ORACLE_S + 0.1) == 1
    assert bench._oracle_rep_count(48.0) == 1  # the sessionize shape
