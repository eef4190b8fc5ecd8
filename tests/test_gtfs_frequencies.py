"""frequencies.txt headway expansion (sources/gtfs.py expand_frequencies):
repetitions on the [start, end) grid, whole-template shifting, >24h clock
wraparound in the regenerated strings, and pass-through of plain trips."""

from __future__ import annotations

from transilien_api_etl_spark.functions.datetime_fns import gtfs_clock_seconds
from transilien_api_etl_spark.sources.gtfs import expand_frequencies

from pyspark.sql import functions as F

ST_SCHEMA = (
    "trip_id string, arrival_time string, departure_time string, "
    "stop_id string, stop_sequence int"
)
FQ_SCHEMA = (
    "trip_id string, start_time string, end_time string, "
    "headway_secs int, exact_times int"
)


def test_expansion_grid_and_template_shift(spark):
    st = spark.createDataFrame(
        [
            ("T1", "06:00:00", "06:00:00", "A", 1),
            ("T1", "06:07:00", "06:08:00", "B", 2),
            ("PLAIN", "09:00:00", "09:00:00", "A", 1),
        ],
        ST_SCHEMA,
    )
    fq = spark.createDataFrame([("T1", "06:00:00", "06:30:00", 600, 1)], FQ_SCHEMA)
    out = expand_frequencies(st, fq).orderBy("trip_id", "stop_sequence").collect()
    trips = {r["trip_id"] for r in out}
    # departures at 06:00, 06:10, 06:20 (06:30 excluded) + untouched PLAIN
    assert trips == {"T1#0", "T1#1", "T1#2", "PLAIN"}
    by_trip = {}
    for r in out:
        by_trip.setdefault(r["trip_id"], []).append(r)
    assert [r["departure_time"] for r in by_trip["T1#1"]] == ["06:10:00", "06:18:00"]
    # arrival offset (stop B arrives 1 min before its departure) is preserved
    assert by_trip["T1#2"][1]["arrival_time"] == "06:27:00"
    assert by_trip["PLAIN"][0]["departure_time"] == "09:00:00"


def test_expansion_crosses_midnight_with_gtfs_clocks(spark):
    st = spark.createDataFrame([("N1", "23:50:00", "23:50:00", "A", 1)], ST_SCHEMA)
    fq = spark.createDataFrame([("N1", "23:50:00", "24:20:00", 900, 0)], FQ_SCHEMA)
    out = expand_frequencies(st, fq).orderBy("trip_id").collect()
    deps = [r["departure_time"] for r in out]
    # 23:50 and 24:05 — the second stays on the GTFS >24h clock, exactly
    # how stop_times encodes after-midnight service
    assert deps == ["23:50:00", "24:05:00"]
    # and the regenerated strings round-trip through the seconds parser
    df = spark.createDataFrame([(d,) for d in deps], "clock string")
    secs = [r[0] for r in df.select(gtfs_clock_seconds(F.col("clock"))).collect()]
    assert secs == [85800, 86700]


def test_multi_window_trip_gets_unique_instance_ids(spark):
    """ADVICE r2: a trip with several frequencies windows (peak + off-peak
    headways — standard GTFS) must NOT reuse instance numbers across
    windows. Instance k continues across windows ordered by start_s, so
    every concrete departure keeps a unique trip_id for downstream joins."""
    st = spark.createDataFrame(
        [
            ("T1", "06:00:00", "06:00:00", "A", 1),
            ("T1", "06:07:00", "06:08:00", "B", 2),
        ],
        ST_SCHEMA,
    )
    fq = spark.createDataFrame(
        [
            # 06:00-06:30 @10min -> instances 0,1,2 (06:00, 06:10, 06:20)
            ("T1", "06:00:00", "06:30:00", 600, 1),
            # 09:00-10:00 @30min -> instances 3,4 (09:00, 09:30)
            ("T1", "09:00:00", "10:00:00", 1800, 1),
        ],
        FQ_SCHEMA,
    )
    out = expand_frequencies(st, fq).collect()
    first_stop_deps = {
        r["trip_id"]: r["departure_time"] for r in out if r["stop_sequence"] == 1
    }
    assert first_stop_deps == {
        "T1#0": "06:00:00",
        "T1#1": "06:10:00",
        "T1#2": "06:20:00",
        "T1#3": "09:00:00",
        "T1#4": "09:30:00",
    }
    # unique-trip-instance contract: no collisions anywhere in the fan-out
    ids = [(r["trip_id"], r["stop_sequence"]) for r in out]
    assert len(ids) == len(set(ids))
    # template shift applies within every window (stop B rides along)
    by_trip = {}
    for r in out:
        by_trip.setdefault(r["trip_id"], {})[r["stop_sequence"]] = r
    assert by_trip["T1#4"][2]["departure_time"] == "09:38:00"
    assert by_trip["T1#4"][2]["arrival_time"] == "09:37:00"


def test_window_starting_within_first_stop_dwell_clamps_arrival(spark):
    """First stop: arrival 00:00:00, departure 00:01:00 (60 s dwell);
    window starts 00:00:10 — the shifted arrival would be -50 s, which a
    GTFS clock string cannot encode. It must clamp to 00:00:00 and stay
    parseable, not emit '-1:-1:-50' garbage (round-5 review)."""
    st = spark.createDataFrame(
        [("T", "00:00:00", "00:01:00", "A", 1), ("T", "00:10:00", "00:10:00", "B", 2)],
        ST_SCHEMA,
    )
    fq = spark.createDataFrame([("T", "00:00:10", "00:10:10", 600, 1)], FQ_SCHEMA)
    out = {r["stop_sequence"]: r for r in expand_frequencies(st, fq).collect()}
    assert out[1]["arrival_time"] == "00:00:00"  # clamped at service midnight
    assert out[1]["departure_time"] == "00:00:10"  # departs at start_time
    # regenerated strings still round-trip through the parser
    df = spark.createDataFrame(
        [(out[1]["arrival_time"],), (out[1]["departure_time"],)], "clock string"
    )
    secs = [r[0] for r in df.select(gtfs_clock_seconds(F.col("clock"))).collect()]
    assert secs == [0, 10]
