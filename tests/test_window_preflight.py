"""Wall-clock pre-flight for the driver-window hazard queries (VERDICT r3
task 2/5, modeled on the PQ analysis-time gate in tests/test_pq.py).

The round-4 correctness window contains nine availableNow streaming twins
(each spins up checkpoints + state stores inside the driver's harness) and
five twin-check composites (each builds TWO full plans and compares them).
A slow checkpoint FS or a state-store partition explosion must fail HERE,
loudly, before it can time out the driver's correctness pass: round 3
measured the stream-stream-join twins at ~29 s under the driver's default
200 shuffle partitions (200 state-store instances); the
_bounded_state_partitions guard in streaming/jobs.py pins state partitions
to the core count and brought them to ~3 s.

Budget: 20 s per query at sf0.01. Calibration history: round-3 quiet-box
measurements ~3 s → budget 10 s; round 9 re-measured the stream-stream
twin at 10-15 s per rep ON AN IDLE BOX (vmstat 100% idle, state
partitions confirmed pinned at 32 — no regression, the host's IO/fsync
latency itself had drifted ~3×), so 10 s false-positived. 20 s still
trips decisively on the guarded failure modes: unpinned state partitions
measured 29 s on a QUIET box (round 3) and would land far above 20 s on
any box state this repo has recorded.
"""

from __future__ import annotations

import time

import pytest

from transilien_api_etl_spark import plans

SF = "/root/testdata/sf0.01"
BUDGET_S = 20.0

HAZARD_QUERIES = [
    # availableNow streaming twins: checkpoint + state-store cost
    "streaming_upsert_foreachbatch",
    "streaming_session_window",
    "streaming_sliding_10m_5m",
    "streaming_stream_stream_join",
    "streaming_incremental_agg",
    "streaming_stream_stream_left_join",
    "streaming_chained_windows",
    "streaming_incremental_dedup",
    "streaming_pit_rate_join",
    # twin checks: each composes two full plans before comparing
    "sketch_cms_error_bounds",
    "docs_minhash_recall",
    "udf_simhash_separation",
    "docs_fingerprint_integrity",
    "lsh_ann_recall",
]


@pytest.mark.parametrize("name", HAZARD_QUERIES)
def test_window_query_under_wall_budget(spark, name):
    fn = plans.queries()[name]
    t0 = time.monotonic()
    rows = fn(spark, SF).collect()
    elapsed = time.monotonic() - t0
    assert rows, f"{name} returned no rows"
    assert elapsed < BUDGET_S, (
        f"{name} took {elapsed:.1f}s at sf0.01 (budget {BUDGET_S}s) — "
        "a driver-harness timeout hazard; check state-store partition "
        "pinning (streaming/jobs._bounded_state_partitions) first"
    )
