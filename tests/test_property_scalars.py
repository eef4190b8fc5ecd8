"""Property-based tests (SURVEY §6.2.4) for the tricky scalar functions:
day-of-service cutoff, GTFS >24:00:00 clock arithmetic, station-id padding
round-trips. Hypothesis generates the inputs; a single Spark job evaluates
the whole batch (one createDataFrame per property run keeps this fast)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.datetime_fns import (
    day_of_service,
    gtfs_clock_seconds,
    service_departure_ts,
)
from transilien_api_etl_spark.functions.strings import (
    drop_checksum_digit,
    normalize_station_id,
    numeric_id,
)

TS = st.datetimes(
    min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 12, 31)
).map(lambda d: d.replace(microsecond=0))


@settings(max_examples=20, deadline=None)
@given(st.lists(TS, min_size=1, max_size=50), st.integers(min_value=0, max_value=12))
def test_day_of_service_cutoff(spark, tss, cutoff):
    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    got = [r.d for r in df.select(day_of_service(F.col("ts"), cutoff).alias("d")).collect()]
    want = [(t - dt.timedelta(hours=cutoff)).strftime("%Y%m%d") for t in tss]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=28),  # GTFS hour, may exceed 23
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=59),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_gtfs_clock_roundtrip(spark, clocks):
    rows = [(f"{h:02d}:{m:02d}:{s:02d}",) for h, m, s in clocks]
    df = spark.createDataFrame(rows, "clock string")
    out = df.select(
        gtfs_clock_seconds(F.col("clock")).alias("secs"),
        service_departure_ts(
            F.to_timestamp(F.lit("2026-01-02"), "yyyy-MM-dd"), F.col("clock")
        ).alias("ts"),
    ).collect()
    base = dt.datetime(2026, 1, 2)
    for (h, m, s), r in zip(clocks, out):
        secs = h * 3600 + m * 60 + s
        assert r.secs == secs
        # >24h clocks land on the NEXT calendar day, exact to the second
        assert r.ts == base + dt.timedelta(seconds=secs)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9_999_999), min_size=1, max_size=50))
def test_station_id_pad_drop_roundtrip(spark, codes):
    df = spark.createDataFrame([(c,) for c in codes], "code long")
    out = df.select(
        normalize_station_id(F.col("code"), 7).alias("code7"),
        drop_checksum_digit(normalize_station_id(F.col("code") * 10 + 3, 8)).alias("back7"),
    ).collect()
    for c, r in zip(codes, out):
        assert r.code7 == f"{c:07d}"
        # pad-to-8-with-checksum then drop-checksum is the identity on 7-digit codes
        assert r.back7 == f"{c:07d}"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="ABCZ-", max_size=4), st.integers(min_value=0, max_value=10**9)),
        min_size=1,
        max_size=50,
    )
)
def test_numeric_id_extracts_first_digit_run(spark, pairs):
    rows = [(f"{prefix}{num}-X",) for prefix, num in pairs]
    df = spark.createDataFrame(rows, "trip_id string")
    got = [r.n for r in df.select(numeric_id(F.col("trip_id")).alias("n")).collect()]
    assert got == [num for _, num in pairs]


def test_malformed_scalar_inputs_yield_null_not_ansi_abort(spark):
    """Round-5 review (confirmed on PySpark 4.1.2 default ANSI): a
    digit-free trip_id or a colon-less clock string used to abort the
    whole job (CAST_INVALID_INPUT / INVALID_ARRAY_INDEX). One bad row in
    a real feed must yield NULL, not kill the materialization."""
    df = spark.createDataFrame(
        [("no-digits-here", "0510"), ("T123", "05:10"), ("T9", "05:10:00")],
        "trip_id string, clock string",
    )
    rows = df.select(
        numeric_id(F.col("trip_id")).alias("n"),
        gtfs_clock_seconds(F.col("clock")).alias("s"),
    ).collect()
    assert [r.n for r in rows] == [None, 123, 9]
    assert [r.s for r in rows] == [None, None, 5 * 3600 + 600]


def test_normalize_station_id_never_truncates(spark):
    """lpad alone TRUNCATES codes longer than the pad width, collapsing
    distinct codes into collisions; long codes must pass through."""
    df = spark.createDataFrame(
        [(42,), (1234567890,), (1234567899,)], "code long"
    )
    got = [
        r.s
        for r in df.select(
            normalize_station_id(F.col("code"), 8).alias("s")
        ).collect()
    ]
    assert got == ["00000042", "1234567890", "1234567899"]


def test_topk_per_group_rejects_rank_col_collision(spark):
    import pytest

    from transilien_api_etl_spark.operators.topk import topk_per_group

    df = spark.createDataFrame([(1, 2, 3)], "g long, v long, rn long")
    with pytest.raises(ValueError, match="rn"):
        topk_per_group(df, ["g"], [F.col("v")], 1)
