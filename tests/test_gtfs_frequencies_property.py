"""Property test for the multi-window frequencies expansion (round-3 fix):
for ARBITRARY window sets, instance ids must be unique and the instance
count must equal Σ (ceil((end-start)/headway) if end > start else 0) — the
documented unique-trip-instance contract over the strictly-before-end_time
GTFS semantics, not just the two examples in tests/test_gtfs_frequencies.py.

Round 4 (ADVICE r3): empty/inverted windows (end <= start) are in the
strategy — they must contribute ZERO instances (no phantom repetition) and
must not shift the instance numbering of the trip's later windows. The
strategy also emits NON-POSITIVE headways (malformed feed rows): ceil of
the negative quotient would make n_reps negative, which silently shifts —
and can collide — the ids of every later window through the rep_offset
running sum, so they too must contribute exactly zero.
"""

from __future__ import annotations

import math

from hypothesis import assume, given, settings, strategies as st

from transilien_api_etl_spark.sources.gtfs import expand_frequencies

ST_SCHEMA = (
    "trip_id string, arrival_time string, departure_time string, "
    "stop_id string, stop_sequence int"
)
FQ_SCHEMA = (
    "trip_id string, start_time string, end_time string, "
    "headway_secs int, exact_times int"
)


def _clock(secs: int) -> str:
    return f"{secs // 3600:02d}:{secs % 3600 // 60:02d}:{secs % 60:02d}"


windows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20 * 3600),  # start second
        # duration: negative/zero (empty or inverted window → 0 reps)
        # through 3 h
        st.integers(min_value=-1800, max_value=3 * 3600),
        # headway: non-positive (malformed row → 0 reps) through 30 min
        st.integers(min_value=-600, max_value=1800),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(windows=windows_strategy)
def test_expansion_counts_and_uniqueness(spark, windows):
    assume(all(s + dur >= 0 for s, dur, _ in windows))
    st_rows = [
        ("T", "06:00:00", "06:00:00", "A", 1),
        ("T", "06:05:00", "06:06:00", "B", 2),
    ]
    fq_rows = [
        ("T", _clock(s), _clock(s + dur), hw, 1) for s, dur, hw in windows
    ]
    out = expand_frequencies(
        spark.createDataFrame(st_rows, ST_SCHEMA),
        spark.createDataFrame(fq_rows, FQ_SCHEMA),
    ).collect()

    expected_instances = sum(
        math.ceil(dur / hw) if dur > 0 and hw > 0 else 0
        for _, dur, hw in windows
    )
    ids = {(r["trip_id"], r["stop_sequence"]) for r in out}
    # no collisions anywhere in the fan-out (the round-3 bug: 'T#0' reused
    # across windows), every expected instance materialized both stops, and
    # empty windows contributed nothing — including to later windows'
    # numbering: the instance ids remain exactly 0..n-1 with no gaps
    assert len(ids) == len(out) == expected_instances * 2
    instance_nums = {
        int(r["trip_id"].split("#")[1]) for r in out if "#" in r["trip_id"]
    }
    assert instance_nums == set(range(expected_instances))


def test_empty_window_trip_yields_no_instances_and_no_passthrough(spark):
    """A trip whose ONLY frequencies window is empty is still
    frequency-based: zero concrete instances, and the template rows do
    NOT leak through the non-frequency passthrough."""
    st_rows = [("T", "06:00:00", "06:00:00", "A", 1), ("U", "07:00:00", "07:00:00", "A", 1)]
    fq_rows = [("T", "08:00:00", "08:00:00", 600, 1)]
    out = expand_frequencies(
        spark.createDataFrame(st_rows, ST_SCHEMA),
        spark.createDataFrame(fq_rows, FQ_SCHEMA),
    ).collect()
    assert {r["trip_id"] for r in out} == {"U"}
