"""Property test for the multi-window frequencies expansion (round-3 fix):
for ARBITRARY window sets, instance ids must be unique and the instance
count must equal Σ max(ceil((end-start)/headway), 1) — the documented
unique-trip-instance contract, not just the two examples in
tests/test_gtfs_frequencies.py."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

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
        st.integers(min_value=60, max_value=3 * 3600),  # duration
        st.integers(min_value=60, max_value=1800),  # headway
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None)
@given(windows=windows_strategy)
def test_expansion_counts_and_uniqueness(spark, windows):
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
        max(math.ceil(dur / hw), 1) for _, dur, hw in windows
    )
    ids = {(r["trip_id"], r["stop_sequence"]) for r in out}
    # no collisions anywhere in the fan-out (the round-3 bug: 'T#0' reused
    # across windows), and every expected instance materialized both stops
    assert len(ids) == len(out) == expected_instances * 2
    instance_nums = {
        int(r["trip_id"].split("#")[1]) for r in out if "#" in r["trip_id"]
    }
    assert instance_nums == set(range(expected_instances))
