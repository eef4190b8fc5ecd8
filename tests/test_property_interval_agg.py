"""Property test: interval_agg_prefix_sum ≡ banded_range_join + groupBy on
random inputs (SURVEY §3 J7 aggregate twin). Hypothesis drives shapes the
fixed registered query cannot: windows entirely in the past/future,
degenerate zero-width windows, probes exactly on block boundaries,
duplicate timestamps on both sides, negative measures, empty overlap.
A python dict model double-checks both plans."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from transilien_api_etl_spark.operators.joins import (
    banded_range_join,
    interval_agg_prefix_sum,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

# offsets in SECONDS around T0; duplicates allowed on purpose
LEFT = st.lists(st.integers(-400, 400), min_size=1, max_size=8)
RIGHT = st.lists(
    st.tuples(st.integers(-400, 400), st.integers(-5, 5)),
    min_size=0,
    max_size=12,
)
# window bounds: crossing zero, fully past, fully future, zero-width
BOUNDS = st.tuples(st.integers(-120, 120), st.integers(-120, 120)).map(
    lambda t: (min(t), max(t))
)


@settings(max_examples=8, deadline=None)
@given(left_offs=LEFT, right_rows=RIGHT, bounds=BOUNDS)
def test_prefix_sum_matches_banded_and_model(spark, left_offs, right_rows, bounds):
    lo, hi = bounds
    left = spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=off)) for i, off in enumerate(left_offs)],
        "pid long, pts timestamp",
    )
    right = spark.createDataFrame(
        [(T0 + dt.timedelta(seconds=off), m) for off, m in right_rows],
        "cts timestamp, cents long",
    ) if right_rows else spark.createDataFrame([], "cts timestamp, cents long")

    fast = {
        r.pid: (r.n_matches, r.sum_cents)
        for r in interval_agg_prefix_sum(
            left, right, "pts", "cts", lo, hi, ["cents"], ["pid"],
            block_seconds=60,  # force multi-block prefix carries
        ).collect()
    }

    model = {}
    for i, off in enumerate(left_offs):
        hits = [m for roff, m in right_rows if off + lo <= roff <= off + hi]
        if hits:
            model[i] = (len(hits), sum(hits))
    assert fast == model

    if hi > lo and right_rows:  # banded join requires a positive span
        j = banded_range_join(
            left, right.withColumnRenamed("cents", "cval"), "pts", "cts", lo, hi
        )
        banded = {
            r.pid: (r.n, r.s)
            for r in j.groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cval").alias("s"))
            .collect()
        }
        assert fast == banded
