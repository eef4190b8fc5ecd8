"""Unit tests for bench.py's timing discipline — the graded numbers'
provenance. Protects the VERDICT r5 task 1 contract: every recorded
number is a MEDIAN of warm reps, timeouts are flagged lower-bounds (never
silent measurements), and rep loops respect the global budget so an
external harness kill can't lose the JSON line."""

from __future__ import annotations

import pytest

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
    no ratio precision); the 5 s slow tier stands. Round 9: the fast
    tier takes 5 reps (graded steady-3) — the identical estimator and
    rep count as the Spark scale light rows, so the steady estimator's
    downward bias cancels in the graded ratio instead of favoring the
    Spark numerator."""
    assert bench._oracle_rep_count(0.5) == 5
    assert bench._oracle_rep_count(bench.SLOW_QUERY_CUTOFF_S + 0.1) == 2
    assert bench._oracle_rep_count(bench.VERY_SLOW_ORACLE_S) == 2  # boundary: not yet very-slow
    assert bench._oracle_rep_count(bench.VERY_SLOW_ORACLE_S + 0.1) == 1
    assert bench._oracle_rep_count(48.0) == 1  # the sessionize shape


def _grade_payload(n_queries=20, skipped=None):
    """Representative full-result payload shaped like BENCH_FULL_last.json."""
    queries = {f"query_name_of_typical_len_{i:02d}": 1.2345 for i in range(n_queries)}
    return {
        "metric": "headline_suite_total",
        "value": 20.44,
        "unit": "sec",
        "stat": "median_of_warm_reps",
        "sf": 0.1,
        "queries": queries,
        "queries_reps": {q: [1.2, 1.3, 1.2] for q in queries},
        "scale": {"rows": {"lineitem": 60_000_000}},
        "grade": {
            "spark": dict(queries),
            "ratio": {q: 1.042 for q in queries},
            "ratio_median": 1.04,
            "bucketed_spark": {"q3_shipping_priority": 1.5, "q5_local_supplier": 1.2},
            "bucketed_ratio": {"q3_shipping_priority": 1.952, "q5_local_supplier": 1.687},
            "variants": ["docs_minhash_candidates", "knn_pq_adc_top10", "semdedup_survivors"],
            "skipped": skipped or [],
        },
        "elapsed_s": 744.1,
    }


def test_compact_line_fits_tail_budget_and_parses():
    """VERDICT r8 task 2: the driver keeps a 2000-char stdout tail and
    records parsed:null unless that tail is itself valid JSON. The whole
    stdout is now ONE line under STDOUT_TAIL_BUDGET carrying the contract
    keys plus every graded ratio."""
    import json

    line = bench.build_compact_line(_grade_payload())
    assert len(line) <= bench.STDOUT_TAIL_BUDGET
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed  # the driver's documented stdout contract
    assert parsed["grade"]["ratio_median"] == 1.04
    assert parsed["grade"]["bucketed_ratio"]["q3_shipping_priority"] == 1.952
    assert parsed["grade"]["skipped"] == []
    # detail (rep spreads, absolute walls) is pointed at, not inlined
    assert parsed["detail"] == "BENCH_FULL_last.json"
    assert "queries_reps" not in parsed


def test_compact_line_trim_ladder_under_pathological_skip_list():
    """A budget-killed run can carry dozens of skipped labels; the trim
    ladder must still produce a parseable line under budget rather than
    silently regressing to parsed:null."""
    import json

    skipped = [f"duckdb:some_quite_long_query_name_{i:03d}" for i in range(40)]
    payload = _grade_payload(n_queries=40, skipped=skipped)
    line = bench.build_compact_line(payload)
    assert len(line) <= bench.STDOUT_TAIL_BUDGET
    parsed = json.loads(line)
    assert parsed["grade"]["ratio_median"] == 1.04  # the headline survives
    # skip flags survive, at worst truncated with an explicit pointer —
    # never silently dropped. Round 10 truncates to 5 (was 10): the
    # skipped rung now fires BEFORE the per-query ratios are sacrificed,
    # so the budget it frees must be larger.
    kept = parsed["grade"]["skipped"]
    # skip info is never silent: full list, head+pointer, or count+pointer
    assert kept == skipped or "see BENCH_FULL_last.json" in kept[-1]
    # ordering contract: the ratio dict may only be sacrificed AFTER the
    # skip list was reduced (this synthetic has 40 queries — twice the
    # real suite — so it legitimately reaches that rung).
    if not isinstance(parsed["grade"]["ratio"], dict):
        assert len(kept) <= 6


def test_compact_line_real_suite_size_keeps_ratios_under_skip_pressure():
    """At the REAL suite size (20 graded rows) a pathological skip list
    must cost annotations and skip-list tail, never the per-query graded
    ratios — they are the artifact's reason to exist (round 10: the old
    ladder order dropped the ratio dict while 14 skip flags rode along
    untrimmed)."""
    import json

    skipped = [f"duckdb-timeout-lower-bound:query_name_{i:03d}" for i in range(40)]
    payload = _grade_payload(n_queries=20, skipped=skipped)
    line = bench.build_compact_line(payload)
    assert len(line) <= bench.STDOUT_TAIL_BUDGET
    parsed = json.loads(line)
    assert isinstance(parsed["grade"]["ratio"], dict)
    assert len(parsed["grade"]["ratio"]) == 20
    kept = parsed["grade"]["skipped"]
    assert "see BENCH_FULL_last.json" in kept[-1]  # reduced, never silent


def test_compact_line_no_scale_phase():
    import json

    payload = _grade_payload()
    del payload["grade"], payload["scale"]
    payload["scale_skipped"] = "budget exhausted before scale phase"
    line = bench.build_compact_line(payload)
    parsed = json.loads(line)
    assert parsed["scale_skipped"] == "budget exhausted before scale phase"
    assert len(line) <= bench.STDOUT_TAIL_BUDGET


def test_median_reps_steady_k_drops_settling_head(monkeypatch):
    """r8 task 3's original case: a settling head before a converged tail
    — steady-3 grades the converged level, head stays in the sidecar."""
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    # settling head (2.4, 1.7) then converged tail
    deltas = iter([2.4, 1.7, 1.0, 0.95, 1.05, 0.9, 1.0, 0.98, 1.02])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(
        lambda: None, warm_s=1.0, n_reps=9, force_reps=True, steady_k=3
    )
    assert len(raw) == 9  # full spread preserved for audit
    # min over 3-windows of the window median: the converged tail's
    # cleanest window ([0.95, 1.05, 0.9] -> 0.95) sets the grade
    assert med == 0.95
    assert raw[0] == 2.4  # ...but auditable in the sidecar spread


def test_median_reps_steady_k_survives_midphase_storm():
    """Round-9 run 7 regression: a host interference storm hit the TAIL
    of the bucketed phase, so the r8 last-5 median graded 2.54 s where
    the steady wall (0.84-0.85, reproduced in reps 2 and 4) was the
    honest number. steady-3 requires no ordering assumption."""
    raw = [2.16, 0.84, 1.16, 0.84, 1.93, 2.90, 2.54, 2.46, 3.19]
    assert bench._steady_median(raw, 3) == 0.84  # window [0.84, 1.16, 0.84]
    # and a single fast outlier cannot set the grade on its own:
    assert bench._steady_median([2.0, 0.1, 2.1, 2.2, 2.05], 3) == 2.0


def test_median_reps_steady_k_budget_truncation_falls_back(monkeypatch):
    """A budget-truncated run grades the plain median of whatever reps
    exist instead of erroring on a short rep list."""
    ran = {"n": 0}

    def run():
        ran["n"] += 1

    monkeypatch.setattr(bench, "remaining", lambda: 5.0)
    med, raw = bench._median_reps(
        run, warm_s=0.1, n_reps=9, force_reps=True, steady_k=3
    )
    assert len(raw) == 1  # only the owed first rep fit the budget
    assert med == raw[0]


def test_median_reps_two_rep_tiebreaker_on_2x_disagreement(monkeypatch):
    """r9: a 2-rep median is a mean, so one pathological rep (observed:
    [26.9, 134.7] on a degraded box) distorts the grade. A >2x
    disagreement triggers one tie-breaker rep when budget allows."""
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    deltas = iter([26.9, 134.7, 27.3])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(lambda: None, warm_s=26.0)  # slow tier: 2 reps
    assert len(raw) == 3  # tie-breaker ran
    assert med == 27.3  # true median, not the 80.8 two-rep mean


def test_median_reps_no_tiebreaker_when_reps_agree(monkeypatch):
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    deltas = iter([26.9, 28.1])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(lambda: None, warm_s=26.0)
    assert len(raw) == 2  # agreement: no extra rep spent


def test_median_reps_no_tiebreaker_without_budget(monkeypatch):
    """The tie-breaker costs the CHEAPER rep's time; without that much
    budget left the distorted 2-rep median is still better than a kill."""
    clock = {"now": 0.0}
    deltas = iter([26.9, 134.7])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    # budget drains with the clock: enough for rep 2 (160-26.9 > 56.9),
    # exhausted by the time the tie-breaker would fire (160-161.6 < 0)
    monkeypatch.setattr(bench, "remaining", lambda: 160.0 - clock["now"])
    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(lambda: None, warm_s=26.0)
    assert len(raw) == 2  # no tie-breaker: budget could not absorb it
    assert med == 80.8  # the distorted mean stands, auditable via raw


def test_oracle_pass_order_cheapest_first_blowouts_last(monkeypatch):
    """Round 11 (8-core PERF shape): the non-blowout oracle pass runs
    CHEAPEST first by the committed-walls estimate map — the old
    twin-first split sent the 12-55 s twin oracles ahead of 1.5-5 s
    plain rows and a budget death between the tiers holed the cheap
    rows. Blowouts stay last (capped lower bound decisive), cheapest
    reserve first. remaining() is pinned healthy so the reserve-scarce
    flip (its own tests below) cannot fire by suite position."""
    from types import SimpleNamespace as NS

    monkeypatch.setattr(bench, "remaining", lambda: 500.0)
    specs = {
        "asof_join_purchase_click": NS(bench_oracle=None, oracle_heavy=True),
        "semdedup_survivors": NS(bench_oracle="select 1", oracle_heavy=False),
        "events_sessionize": NS(bench_oracle=None, oracle_heavy=True),
        "knn_pq_adc_top10": NS(bench_oracle="select 1", oracle_heavy=False),
        "docs_segment_dedup": NS(bench_oracle=None, oracle_heavy=False),
        "docs_minhash_candidates": NS(bench_oracle="select 1", oracle_heavy=False),
    }
    order = bench.oracle_pass_order(specs, bench_variant=True)
    assert order == [
        "docs_segment_dedup",  # 3 s — cheapest measurable first
        "docs_minhash_candidates",  # 6 s (round-12 reduced twin)
        "knn_pq_adc_top10",  # 10 s
        "semdedup_survivors",  # 25 s
        "asof_join_purchase_click",  # blowouts last, cheapest reserve first
        "events_sessionize",
    ]
    # the order is deliberately bench_variant-independent now
    assert bench.oracle_pass_order(specs, bench_variant=False) == order


def test_force_reps_genuinely_slow_falls_to_two_rep_tier(monkeypatch):
    """ADVICE r9 (low): force_reps exists to protect sub-second queries
    from a COLD-CACHE warm rep tripping the slow cutoff — but a row whose
    warm rep AND first timed rep both exceed the cutoff is genuinely
    slow, and pinning it to 5 reps steady-3 over a 2-rep oracle mean is
    a tier where the estimators diverge. It must fall back to the same
    2-rep plain-median tier the oracle side uses."""
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    deltas = iter([6.2, 6.4, 6.0, 6.1, 6.3])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(
        lambda: None, warm_s=6.5, n_reps=5, force_reps=True, steady_k=3
    )
    assert len(raw) == 2  # matched the oracle's 2-rep tier
    assert med == 6.3  # plain median (mean of 2), not a steady-3 min


def test_force_reps_cold_cache_keeps_full_reps(monkeypatch):
    """The case force_reps exists FOR: slow warm-up (cold page cache),
    fast timed reps — the full rep count and steady grade must stand."""
    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    clock = {"now": 0.0}
    deltas = iter([1.2, 1.0, 0.9, 1.0, 1.1])
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(deltas)
        return clock["now"]

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    med, raw = bench._median_reps(
        lambda: None, warm_s=6.5, n_reps=5, force_reps=True, steady_k=3
    )
    assert len(raw) == 5
    assert med == 1.0


def _fake_paired_harness(
    monkeypatch, spark_deltas, duck_deltas, n_warm=1, name="fake_q", n_reps=None
):
    """Drive bench.time_paired with a scripted clock: spark rep i takes
    spark_deltas[i], oracle rep i returns duck_deltas[i] directly.
    ``n_reps`` defaults to len(duck_deltas); pass a smaller base count to
    exercise the STORM_EXPOSED_ROWS extra-rep path (the deltas lists must
    then hold base+extra values)."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(bench, "remaining", lambda: 1e9)
    log = []

    class FakeResult:
        def count(self):
            log.append("S")
            return 1

    spec = QuerySpec(name=name, fn=lambda s, d: FakeResult(), oracle="SELECT 1")
    monkeypatch.setitem(bench.REGISTRY, name, spec)

    clock = {"now": 0.0}
    sd = iter(spark_deltas)
    calls = {"n": 0}

    def fake_counter():
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            clock["now"] += next(sd)
        return clock["now"]

    dd = iter([None] * (n_warm and 1) + list(duck_deltas))  # first = warm rep

    def fake_guarded(con, sql, cap):
        log.append("D")
        v = next(dd)
        return 0.01 if v is None else v

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    monkeypatch.setattr(bench, "_guarded_run", fake_guarded)
    out = bench.time_paired(
        {name: spec}, spark=None, data_dir="/nowhere", con=None,
        skipped=[], n_reps=n_reps or len(duck_deltas), steady_k=3,
        n_warm=n_warm, bench_variant=False,
    )
    return out, log


def test_time_paired_grades_per_rep_quotients_not_wall_quotient(monkeypatch):
    """VERDICT r9 task 1: a storm that inflates BOTH engines' rep i must
    cancel in the quotient. Here rep 3 is a 4x storm on both sides: the
    per-rep quotient sequence stays ~1.0, while a ratio-of-medians
    protocol would have been exposed to whichever side's median the
    storm happened to land in."""
    (spark_t, sreps, duck_t, dreps, ratio_t, rreps), log = _fake_paired_harness(
        monkeypatch,
        spark_deltas=[0.5, 0.52, 2.0, 0.48, 0.5],
        duck_deltas=[0.5, 0.5, 2.1, 0.5, 0.52],
    )
    assert sreps["fake_q"] == [0.5, 0.52, 2.0, 0.48, 0.5]
    assert dreps["fake_q"] == [0.5, 0.5, 2.1, 0.5, 0.52]
    # quotients [1.0, 1.04, 0.952, 0.96, 0.962] -> steady-3 ~0.96
    assert rreps["fake_q"] == [1.0, 1.04, 0.9524, 0.96, 0.9615]
    assert 0.95 <= ratio_t["fake_q"] <= 1.0
    # graded ratio comes from the quotient sequence, not the walls:
    assert ratio_t["fake_q"] != round(spark_t["fake_q"] / duck_t["fake_q"], 3)


def test_time_paired_alternates_engines_per_rep(monkeypatch):
    """The pairing claim is temporal: spark rep i immediately followed by
    oracle rep i (warm-ups first, one per engine)."""
    _, log = _fake_paired_harness(
        monkeypatch,
        spark_deltas=[0.5, 0.5, 0.5],
        duck_deltas=[0.5, 0.5, 0.5],
    )
    # S (spark warm), D (duck warm), then strict S D S D S D
    assert log == ["S", "D", "S", "D", "S", "D", "S", "D"]


def test_time_paired_one_sided_storm_moves_only_its_rep(monkeypatch):
    """A storm that hits ONLY the spark side of rep 3 distorts quotient 3
    alone; the steady-3 window over quotients excludes it (the old
    ratio-of-medians could not, when the storm landed mid-median)."""
    (_, _, _, _, ratio_t, rreps), _ = _fake_paired_harness(
        monkeypatch,
        spark_deltas=[0.5, 0.5, 2.0, 0.5, 0.5],
        duck_deltas=[0.5, 0.5, 0.5, 0.5, 0.5],
    )
    assert rreps["fake_q"] == [1.0, 1.0, 4.0, 1.0, 1.0]
    assert ratio_t["fake_q"] == 1.0


def test_time_paired_storm_exposed_row_gets_extra_reps(monkeypatch):
    """STORM_EXPOSED_ROWS (round 12): on a calm box the four storm-exposed
    near-bar rows take n_reps + EXTRA_STORM_REPS alternating reps — the
    SAME count on both engines of the quotient (the code-review-r9
    symmetry rule holds per row, inside one loop)."""
    monkeypatch.setitem(bench._DRIFT, "v", 1.0)
    name = "docs_word_freq_top20"
    assert name in bench.STORM_EXPOSED_ROWS
    (_, sreps, _, dreps, _, rreps), log = _fake_paired_harness(
        monkeypatch,
        spark_deltas=[0.5] * 7,
        duck_deltas=[0.5] * 7,
        name=name,
        n_reps=5,
    )
    assert len(sreps[name]) == 5 + bench.EXTRA_STORM_REPS
    assert len(dreps[name]) == len(sreps[name])  # symmetric counts
    # strict alternation holds across the extra reps too (warm S, warm D,
    # then S D x 7)
    assert log == ["S", "D"] + ["S", "D"] * 7


def test_time_paired_storm_extra_reps_recover_midrun_storm(monkeypatch):
    """The motivating failure (bench run B this round): a one-sided 3-rep
    storm at 5 reps contaminates every steady-3 window (best window still
    held one storm rep -> graded 2.134 on a ~1.2 plan). With the +2 extra
    reps the trailing calm pair restores a clean window and the grade is
    the plan's."""
    monkeypatch.setitem(bench._DRIFT, "v", 1.0)
    # q1, not the knn rows: the fake spec's "SELECT 1" oracle has no
    # query-vector hoist marker, which _hoist_qvec demands for QVEC_HOIST
    # rows — the extra-rep path under test is name-keyed identically.
    name = "q1_pricing_summary"
    (_, _, _, _, ratio_t, rreps), _ = _fake_paired_harness(
        monkeypatch,
        # reps 2-4 are a one-sided spark storm; reps 5-7 calm again
        spark_deltas=[0.6, 2.4, 3.6, 1.8, 0.6, 0.6, 0.6],
        duck_deltas=[0.5] * 7,
        name=name,
        n_reps=5,
    )
    assert rreps[name] == [1.2, 4.8, 7.2, 3.6, 1.2, 1.2, 1.2]
    # steady-3 over the last three calm quotients
    assert ratio_t[name] == 1.2


def test_time_paired_drift_gate_drops_storm_extras(monkeypatch):
    """On a degraded box (sentinel >= DRIFT_GATE) the extras vanish with
    the same gate that drops the fast tier 5 -> 3: budget beats
    robustness when the box is already dying."""
    monkeypatch.setitem(bench._DRIFT, "v", bench.DRIFT_GATE)
    assert bench.storm_extra_reps() == 0
    name = "q1_pricing_summary"
    (_, sreps, _, dreps, _, _), _ = _fake_paired_harness(
        monkeypatch,
        spark_deltas=[0.5] * 3,
        duck_deltas=[0.5] * 3,
        name=name,
        n_reps=3,
    )
    assert len(sreps[name]) == 3
    assert len(dreps[name]) == 3


def test_time_paired_real_query_end_to_end(spark):
    """Plumbing smoke on real data: q1 at sf0.001 through a real DuckDB
    connection (incl. the q_vec setup in _duck_connect). Uses the shared
    session fixture — build_session here would getOrCreate the SAME
    active session and a stop() would kill it for every later test."""
    con = bench._duck_connect("/root/testdata/sf0.001")
    spec = bench.REGISTRY["q1_pricing_summary"]
    spark_t, sreps, duck_t, dreps, ratio_t, rreps = bench.time_paired(
        {"q1_pricing_summary": spec}, spark, "/root/testdata/sf0.001",
        con, skipped=[], n_reps=3, steady_k=3, bench_variant=False,
    )
    con.close()
    assert spark_t["q1_pricing_summary"] > 0
    assert duck_t["q1_pricing_summary"] > 0
    # q1 is in STORM_EXPOSED_ROWS, so the base 3 reps gain the live
    # gate's extras (2 on a calm box, 0 past the drift gate)
    assert len(rreps["q1_pricing_summary"]) == 3 + bench.storm_extra_reps()
    assert ratio_t["q1_pricing_summary"] > 0


def test_time_duckdb_binder_error_is_flagged_not_graded():
    """Code-review round 10: a binder/config error (missing table, bad
    SQL) must NOT be recorded as a cap-valued 'timeout lower bound' —
    that would grade a broken setup as a decisive Spark win. It is
    flagged as duckdb-error and the row gets NO timing at all."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    bad = QuerySpec(
        name="broken_oracle_q",
        fn=lambda s, d: None,
        oracle="SELECT * FROM this_table_does_not_exist",
    )
    bench.REGISTRY.setdefault("broken_oracle_q", bad)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"broken_oracle_q": bad}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert "broken_oracle_q" not in timings
        assert any(s.startswith("duckdb-error:broken_oracle_q") for s in skipped)
        assert not any("timeout" in s for s in skipped)
    finally:
        bench.REGISTRY.pop("broken_oracle_q", None)


def test_time_paired_binder_error_skips_row_with_flag(monkeypatch, spark):
    """Same contract on the paired path: an erroring oracle cannot be
    paired — the row is skipped loudly, nothing is graded."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    spec = QuerySpec(
        name="broken_paired_q",
        fn=lambda s, d: s.range(1),
        oracle="SELECT * FROM this_table_does_not_exist",
    )
    con = bench._duck_connect("/root/testdata/sf0.001")
    skipped = []
    out = bench.time_paired(
        {"broken_paired_q": spec}, spark, "/root/testdata/sf0.001", con,
        skipped=skipped, n_reps=2, steady_k=1, bench_variant=False,
    )
    con.close()
    assert all(not d for d in out)  # all six result dicts empty
    assert any(s.startswith("duckdb-error:broken_paired_q") for s in skipped)


def test_time_duckdb_blowout_tier_counts_warm_as_single_rep(monkeypatch):
    """Round 10 run 5: an oracle_heavy row past VERY_SLOW_ORACLE_S used
    to pay warm + one duplicate rep (~2x its 25-50 s wall); the warm run
    now IS the single rep. One execution total, timing == that rep."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    calls = {"n": 0}
    real = bench._guarded_run

    def counting(con, sql, cap):
        calls["n"] += 1
        return real(con, sql, cap)

    monkeypatch.setattr(bench, "_guarded_run", counting)
    monkeypatch.setattr(bench, "VERY_SLOW_ORACLE_S", 0.0)
    # Pin the budget: _T_START is set at bench IMPORT (pytest collection),
    # so on a slow full-suite run real remaining() can cross the entry
    # gate and this test would assert against a skip instead
    # (code-review round 10).
    monkeypatch.setattr(bench, "remaining", lambda: 1000.0)
    spec = QuerySpec(
        name="blowout_q",
        fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
        oracle_heavy=True,
    )
    bench.REGISTRY.setdefault("blowout_q", spec)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"blowout_q": spec}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert calls["n"] == 1
        assert reps["blowout_q"] == [timings["blowout_q"]]
        assert skipped == []
    finally:
        bench.REGISTRY.pop("blowout_q", None)


def test_time_duckdb_near_death_runs_with_shrunken_cap(monkeypatch):
    """Round 10 run 5: at remaining=25 the old gate (<=30) dropped the
    row entirely — three dropped Spark-favoring blowouts moved
    ratio_median 0.8 -> 1.38 by omission. The row must now run under a
    budget-shrunken cap and record a real timing."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(bench, "remaining", lambda: 25.0)
    spec = QuerySpec(
        name="near_death_q",
        fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
    )
    bench.REGISTRY.setdefault("near_death_q", spec)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"near_death_q": spec}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert "near_death_q" in timings and reps["near_death_q"]
        assert skipped == []
    finally:
        bench.REGISTRY.pop("near_death_q", None)


def test_time_duckdb_entry_degraded_records_flagged_cold_rep(monkeypatch):
    """Round 11, 8-core PERF shape: inside the last WARM_CAP_FLOOR_S of
    headroom the old entry gate holed the row (three Spark-favoring
    oracles -> ratio_median 0.61 -> 1.31 by omission). It must now run
    one warm rep capped at the residual headroom and grade it as a
    FLAGGED cold rep."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    # headroom = 15 - 12 = 3 s: below WARM_CAP_FLOOR_S (8), above
    # LAST_DITCH_FLOOR_S (2) -> degraded single-warm mode.
    monkeypatch.setattr(bench, "remaining", lambda: 15.0)
    spec = QuerySpec(
        name="degraded_q",
        fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
    )
    bench.REGISTRY.setdefault("degraded_q", spec)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"degraded_q": spec}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert "degraded_q" in timings
        assert reps["degraded_q"] == [timings["degraded_q"]]  # 1 cold rep
        assert skipped == ["duckdb-near-death-cold-rep:degraded_q"]
    finally:
        bench.REGISTRY.pop("degraded_q", None)


def test_time_duckdb_true_death_still_skips(monkeypatch):
    """Below LAST_DITCH_FLOOR_S of headroom nothing runs: the skip flag
    (not a phantom timing) is the record."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(bench, "remaining", lambda: 13.5)  # headroom 1.5
    spec = QuerySpec(
        name="dead_q",
        fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
    )
    bench.REGISTRY.setdefault("dead_q", spec)
    try:
        skipped = []
        timings, _ = bench.time_duckdb(
            {"dead_q": spec}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert timings == {} and "duckdb:dead_q" in skipped
    finally:
        bench.REGISTRY.pop("dead_q", None)


def test_time_duckdb_rep_loop_budget_break_grades_flagged_cold_rep(monkeypatch):
    """Code-review round 10 + round 11: once another floor-capped rep
    cannot leave the ~12 s teardown margin, the rep loop stops instead
    of draining to ~2 s — and a row whose warm COMPLETED but whose reps
    never ran is graded as a flagged cold rep (round 11: the old loud
    drop still reshaped ratio_median by omission), never silently."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    budget = iter([25.0] + [16.0] * 50)  # entry gate passes, reps cannot
    monkeypatch.setattr(bench, "remaining", lambda: next(budget))
    spec = QuerySpec(
        name="rep_break_q",
        fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
    )
    bench.REGISTRY.setdefault("rep_break_q", spec)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"rep_break_q": spec}, "/root/testdata/sf0.001", skipped=skipped
        )
        assert "rep_break_q" in timings
        assert reps["rep_break_q"] == [timings["rep_break_q"]]
        assert skipped == ["duckdb-near-death-cold-rep:rep_break_q"]
    finally:
        bench.REGISTRY.pop("rep_break_q", None)


def _degraded_paired_harness(monkeypatch, remaining_s):
    """time_paired under a near-death budget (ADVICE r10): scripted clock,
    one 0.2 s Spark rep, oracle reps return 0.1 s."""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(bench, "remaining", lambda: remaining_s)
    log = []

    class FakeResult:
        def count(self):
            log.append("S")
            return 1

    spec = QuerySpec(name="fake_q", fn=lambda s, d: FakeResult(), oracle="SELECT 1")
    monkeypatch.setitem(bench.REGISTRY, "fake_q", spec)

    clock = {"now": 0.0}

    def fake_counter():
        clock["now"] += 0.1
        return clock["now"]

    def fake_guarded(con, sql, cap):
        log.append("D")
        return 0.1

    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    monkeypatch.setattr(bench, "_guarded_run", fake_guarded)
    skipped = []
    out = bench.time_paired(
        {"fake_q": spec}, spark=None, data_dir="/nowhere", con=None,
        skipped=skipped, n_reps=5, steady_k=3, n_warm=1, bench_variant=False,
    )
    return out, log, skipped


def test_time_paired_near_death_degrades_to_flagged_cold_pair(monkeypatch):
    """Between the entry gate (30 s) and the drop floor (15 s), a paired
    row must still be GRADED — one cold Spark rep paired with one oracle
    rep, no warm-ups — and flagged, not silently removed from the
    ratio_median (the caps-not-holes rule time_duckdb already follows)."""
    out, log, skipped = _degraded_paired_harness(monkeypatch, remaining_s=20.0)
    spark_t, sreps, duck_t, dreps, ratio_t, rreps = out
    assert "fake_q" in ratio_t  # the row IS graded
    assert len(sreps["fake_q"]) == 1 and len(dreps["fake_q"]) == 1
    assert log == ["S", "D"]  # exactly one pair, zero warm-ups
    assert "paired-degraded-cold-pair:fake_q" in skipped


def test_time_paired_below_teardown_floor_drops_loudly(monkeypatch):
    out, log, skipped = _degraded_paired_harness(monkeypatch, remaining_s=12.0)
    _, _, _, _, ratio_t, _ = out
    assert ratio_t == {}
    assert log == []  # nothing ran
    assert "paired:fake_q" in skipped


def test_remaining_is_reserve_aware_and_release_restores(monkeypatch):
    """Round 11 run 12: while the blowout tier is untimed, remaining()
    withholds its reserve from every other gate; releasing a row returns
    exactly its share, and release is idempotent."""
    import time as _time

    monkeypatch.setattr(bench, "BUDGET_S", 1000.0)
    monkeypatch.setattr(bench, "_T_START", _time.perf_counter())
    bench._reset_reserve()
    try:
        full = sum(bench.BLOWOUT_RESERVE_S.values())
        assert bench.remaining() == pytest.approx(1000.0 - full, abs=1.0)
        bench.release_reserve("asof_join_purchase_click")
        bench.release_reserve("asof_join_purchase_click")  # idempotent
        held = full - bench.BLOWOUT_RESERVE_S["asof_join_purchase_click"]
        assert bench.remaining() == pytest.approx(1000.0 - held, abs=1.0)
        bench.release_reserve_all()
        assert bench.remaining() == pytest.approx(1000.0, abs=1.0)
    finally:
        bench._reset_reserve()


def test_blowout_reserve_protects_tier2_under_budget_death(monkeypatch):
    """Round 11 run 12 (elapsed 1185/1200 s): every earlier phase drained
    the budget and the entry gate skipped all three blowout oracles — the
    suite's most Spark-favoring ratios became holes and ratio_median moved
    0.77 -> 1.37 by omission. At 160 s of TRUE budget the pass starts
    reserve-scarce (visible 12 s, inside the degraded-mode gate), so the
    flip fires: the blowout runs FIRST on its released share and records
    its measured rep, and the plain row — which the pre-flip order
    degraded to a loud drop while the reserve sat unspent — now rides the
    released budget to a full measurement. Nothing is skipped. (Round 12
    shrank the blowout reserves 148 -> 87 s with the reduced twins, so the
    reserve-scarce scenario — visible headroom ~12 s at pass start — now
    corresponds to ~99 s of true budget instead of 160.)"""
    import time as _time

    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(
        bench, "BUDGET_S", sum(bench.BLOWOUT_RESERVE_S.values()) + 12.0
    )
    monkeypatch.setattr(bench, "_T_START", _time.perf_counter())
    monkeypatch.setattr(bench, "VERY_SLOW_ORACLE_S", 0.0)
    bench._reset_reserve()
    plain = QuerySpec(
        name="plain_q", fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM region",
    )
    blow = QuerySpec(
        name="events_sessionize", fn=lambda s, d: None,
        oracle="SELECT count(*) AS n FROM nation", oracle_heavy=True,
    )
    bench.REGISTRY.setdefault("plain_q", plain)
    try:
        skipped = []
        timings, reps = bench.time_duckdb(
            {"plain_q": plain, "events_sessionize": blow},
            "/root/testdata/sf0.001", skipped=skipped,
        )
        assert bench._ORACLE_ORDER_FLIP["flipped"]
        assert "events_sessionize" in timings  # reserve spent on itself
        assert reps["events_sessionize"] == [timings["events_sessionize"]]
        # the blowout's released share funds the plain row: measured, not
        # the pre-flip "duckdb:plain_q" drop (the VERY_SLOW patch above
        # puts ALL rows in the 1-rep tier, hence no rep-count assert)
        assert "plain_q" in timings
        assert reps["plain_q"]
        assert skipped == []
    finally:
        bench.REGISTRY.pop("plain_q", None)
        bench._reset_reserve()


def test_oracle_pass_order_tier2_cheapest_reserve_first(monkeypatch):
    """Under a dying budget, cheapest blowout first maximizes the number
    of tier-2 rows that record a measured rep. (remaining() pinned
    healthy: the flip case is tested separately.)"""
    from transilien_api_etl_spark.plans.registry import QuerySpec

    monkeypatch.setattr(bench, "remaining", lambda: 500.0)
    specs = {
        n: QuerySpec(name=n, fn=lambda s, d: None, oracle="SELECT 1 AS x",
                     oracle_heavy=True)
        for n in bench.BLOWOUT_RESERVE_S
    }
    order = bench.oracle_pass_order(specs, bench_variant=False)
    assert order == [
        "window_rolling_avg",          # 8 s
        "asof_join_purchase_click",    # 55 s
        "events_sessionize",           # 85 s
    ]


def test_oracle_pass_order_reserve_scarce_flip(monkeypatch):
    """Round 11 (session-4 8-core run): when the oracle pass STARTS with
    the reserve-withheld headroom already inside the degraded-mode gate,
    every mid-tier row is doomed to a last-ditch cap or drop while ~148 s
    of reserve waits for the last tier — that run dropped pretrain/pq_adc
    and the blowouts then underspent their reserve by ~43 s. The flip
    runs blowouts FIRST, LARGEST reserve first (each release unlocks the
    most true budget soonest), mid tier cheapest-first after."""
    from types import SimpleNamespace as NS

    specs = {
        "asof_join_purchase_click": NS(bench_oracle=None, oracle_heavy=True),
        "semdedup_survivors": NS(bench_oracle="select 1", oracle_heavy=False),
        "events_sessionize": NS(bench_oracle=None, oracle_heavy=True),
        "window_rolling_avg": NS(bench_oracle=None, oracle_heavy=True),
        "knn_pq_adc_top10": NS(bench_oracle="select 1", oracle_heavy=False),
        "docs_segment_dedup": NS(bench_oracle=None, oracle_heavy=False),
    }
    bench._reset_reserve()
    try:
        # visible headroom 19.9 s < TEARDOWN_MARGIN_S + WARM_CAP_FLOOR_S
        monkeypatch.setattr(bench, "remaining", lambda: 19.9)
        order = bench.oracle_pass_order(specs, bench_variant=True)
        assert order == [
            "events_sessionize",         # 85 s reserve — largest first
            "asof_join_purchase_click",  # 55 s
            "window_rolling_avg",        # 8 s
            "docs_segment_dedup",        # mid tier cheapest-first after
            "knn_pq_adc_top10",
            "semdedup_survivors",
        ]
        assert bench._ORACLE_ORDER_FLIP["flipped"]
    finally:
        bench._reset_reserve()
    assert not bench._ORACLE_ORDER_FLIP["flipped"]  # reset hook clears it


def test_oracle_pass_order_no_flip_at_gate_or_when_reserve_spent(monkeypatch):
    """The flip keys on BOTH scarcity and an unspent reserve: at exactly
    20 s of visible headroom (the degraded-mode gate) the order is the
    normal one, and below the gate with every blowout share already
    released the blowouts stay LAST — flipping then would burn a dying
    budget on the most expensive rows with nothing to release."""
    from types import SimpleNamespace as NS

    specs = {
        "asof_join_purchase_click": NS(bench_oracle=None, oracle_heavy=True),
        "docs_segment_dedup": NS(bench_oracle=None, oracle_heavy=False),
    }
    normal = ["docs_segment_dedup", "asof_join_purchase_click"]
    bench._reset_reserve()
    try:
        gate = bench.TEARDOWN_MARGIN_S + bench.WARM_CAP_FLOOR_S
        monkeypatch.setattr(bench, "remaining", lambda: gate)
        assert bench.oracle_pass_order(specs, bench_variant=False) == normal
        assert not bench._ORACLE_ORDER_FLIP["flipped"]
        monkeypatch.setattr(bench, "remaining", lambda: 1.0)
        bench.release_reserve("asof_join_purchase_click")
        assert bench.oracle_pass_order(specs, bench_variant=False) == normal
        assert not bench._ORACLE_ORDER_FLIP["flipped"]
    finally:
        bench._reset_reserve()


def test_reserve_is_zero_when_scale_phase_disabled(monkeypatch):
    """SPARK_GRAFT_SCALE=0 means the blowout tier never runs: holding
    its reserve would starve the headline phase for nothing."""
    monkeypatch.setattr(bench, "RUN_SCALE", False)
    assert bench._init_reserve() == 0.0
    monkeypatch.setattr(bench, "RUN_SCALE", True)
    assert bench._init_reserve() == sum(bench.BLOWOUT_RESERVE_S.values())
