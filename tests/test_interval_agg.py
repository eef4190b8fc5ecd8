"""interval_agg_prefix_sum — the density-robust aggregate-only twin of
banded_range_join (SURVEY §3 J7 escape hatch, VERDICT r5 task 5).

The contract under test: bit-equal answers to the pair-materializing plan
(same count, same exact-integer sums, same zero-match drop) without ever
building the pair set — including the boundary inclusivity at both window
edges, which the probe/tag ordering encodes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from transilien_api_etl_spark.operators.joins import (
    banded_range_join,
    interval_agg_prefix_sum,
)

from .conftest import SF_SMOKE


def _events_split(spark, sf_dir):
    from transilien_api_etl_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("cts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return p, c


def test_matches_banded_join_aggregate(spark):
    p, c = _events_split(spark, SF_SMOKE)
    j = banded_range_join(
        p, c.select("cts", F.col("cents").alias("cval")), "pts", "cts", -300, 0
    )
    banded = j.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_matches"), F.sum("cval").alias("sum_cents")
    )
    fast = interval_agg_prefix_sum(p, c, "pts", "cts", -300, 0, ["cents"], ["pid"])
    assert banded.exceptAll(fast).count() == 0
    assert fast.exceptAll(banded).count() == 0


def test_boundary_inclusive_both_edges(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame([(1, t0)], "pid long, pts timestamp")
    right = spark.createDataFrame(
        [
            (t0 - 300 * s - us, 1),  # just below lower bound: excluded
            (t0 - 300 * s, 10),      # exactly lower bound: included
            (t0, 100),               # exactly upper bound: included
            (t0 + us, 1000),         # just above: excluded
        ],
        "cts timestamp, cents long",
    )
    row = interval_agg_prefix_sum(
        left, right, "pts", "cts", -300, 0, ["cents"], ["pid"]
    ).collect()
    assert len(row) == 1
    assert row[0].n_matches == 2
    assert row[0].sum_cents == 110


def test_zero_match_rows_dropped_and_negatives_exact(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + 10 * h)], "pid long, pts timestamp"
    )
    # negative measures cross a block boundary (block_seconds=60): the
    # prior-block cumulative path must stay exact, not max-based
    right = spark.createDataFrame(
        [(t0 - dt.timedelta(seconds=90), -7), (t0 - dt.timedelta(seconds=5), 3)],
        "cts timestamp, cents long",
    )
    rows = interval_agg_prefix_sum(
        left, right, "pts", "cts", -300, 0, ["cents"], ["pid"], block_seconds=60
    ).collect()
    assert len(rows) == 1  # pid=2 has no clicks in window -> dropped
    assert rows[0].pid == 1
    assert rows[0].n_matches == 2
    assert rows[0].sum_cents == -4


def test_null_timestamps_match_banded_semantics(spark):
    import pytest

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (2, None)], "pid long, pts timestamp"
    )
    right = spark.createDataFrame(
        [(t0 - dt.timedelta(seconds=5), 3), (None, 99)],
        "cts timestamp, cents long",
    )
    rows = interval_agg_prefix_sum(
        left, right, "pts", "cts", -300, 0, ["cents"], ["pid"]
    ).collect()
    # NULL never satisfies the interval predicate: the NULL-ts probe row
    # is dropped and the NULL-ts click counts for nobody
    assert [(r.pid, r.n_matches, r.sum_cents) for r in rows] == [(1, 1, 3)]

    with pytest.raises(ValueError, match="collide"):
        interval_agg_prefix_sum(
            left.withColumnRenamed("pid", "_cnt"),
            right, "pts", "cts", -300, 0, ["cents"], ["_cnt"],
        )


def test_sum_cols_guard_duplicates_and_clashes(spark):
    import pytest

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0)], "pid long, pts timestamp")
    right = spark.createDataFrame(
        [(t0, 3, 4)], "cts timestamp, cents long, _blk long"
    )
    with pytest.raises(ValueError, match="duplicates"):
        interval_agg_prefix_sum(
            left, right, "pts", "cts", -300, 0, ["cents", "cents"], ["pid"]
        )
    # a sum_col named like an internal column fails the NAMED guard,
    # not a later opaque ambiguous-column analysis error
    with pytest.raises(ValueError, match="sum_cols collide"):
        interval_agg_prefix_sum(
            left, right, "pts", "cts", -300, 0, ["_blk"], ["pid"]
        )
