"""The two as-of strategies (join+rank vs union/merge-scan) must agree
exactly — same match, same tie-break, same null behavior (SURVEY §3 J6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.joins import asof_join

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("tolerance", [None, 3600])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_union_matches_join_strategy(spark, tolerance, direction):
    e = load_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")

    def run(strategy):
        m = asof_join(
            purchases,
            clicks,
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            left_keys=["event_id"],
            direction=direction,
            tolerance_seconds=tolerance,
            strategy=strategy,
        )
        return {
            r["pid"]: (r["cid"], r["cts"])
            for r in m.select(
                F.col("l.event_id").alias("pid"),
                F.col("r.event_id").alias("cid"),
                F.col("r.ts").alias("cts"),
            ).collect()
        }

    via_join = run("join")
    via_union = run("union")
    assert via_join == via_union
    assert len(via_join) > 0
    if tolerance is None:
        # some purchase has a match (sanity: not all-null)
        assert any(cid is not None for cid, _ in via_join.values())


def test_union_strategy_rejects_unsupported(spark):
    e = load_table(spark, SF, "events").limit(10)
    with pytest.raises(ValueError):
        asof_join(
            e, e, on=["user_id"], left_ts="ts", right_ts="ts",
            left_keys=["event_id"], direction="sideways", strategy="union",
        )
    with pytest.raises(ValueError):
        asof_join(
            e, e, on=["user_id"], left_ts="ts", right_ts="ts",
            left_keys=["event_id"], how="inner", strategy="union",
        )


from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # (user, seconds-offset, is_click) event tuples, incl. hot keys
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=7200),
            st.booleans(),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_union_matches_join_on_generated_data(spark, events):
    base = datetime(2026, 1, 1)
    rows = [
        (i, u, base + timedelta(seconds=s), "click" if c else "purchase")
        for i, (u, s, c) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, typ string")
    left = df.filter(F.col("typ") == "purchase").select("event_id", "user_id", "ts")
    right = df.filter(F.col("typ") == "click").select("user_id", "event_id", "ts")
    if not left.count():
        return

    def run(strategy):
        m = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            left_keys=["event_id"], direction="backward", strategy=strategy,
        )
        return sorted(
            (r["pid"], r["cid"])
            for r in m.select(
                F.col("l.event_id").alias("pid"), F.col("r.event_id").alias("cid")
            ).collect()
        )

    assert run("union") == run("join")


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_union_matches_join_with_null_keys_and_timestamps(spark, direction):
    """Round-5 review: the window scan groups NULL keys into one partition
    and sorts NULL timestamps into match positions, unlike the equi-join
    (NULL never matches). Both strategies must agree on NULL-laden data."""
    from datetime import datetime

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, t(10)),
            (2, None, t(10)),   # NULL key: never matches
            (3, 10, None),      # NULL ts: never matches
            (4, 20, t(30)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, t(5)),
            (101, 10, t(40)),
            (102, None, t(5)),   # NULL key right: matches nothing
            (103, 20, None),     # NULL ts right: matches nothing
            (104, 20, t(25)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    # column order: on-key first like the callers do
    right = right.select("user_id", "event_id", "ts")

    def run(strategy):
        m = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            left_keys=["event_id"], direction=direction, strategy=strategy,
        )
        return sorted(
            (r["pid"], r["cid"])
            for r in m.select(
                F.col("l.event_id").alias("pid"), F.col("r.event_id").alias("cid")
            ).collect()
        )

    got_union, got_join = run("union"), run("join")
    assert got_union == got_join
    matches = dict(got_union)
    assert matches[2] is None and matches[3] is None  # NULLs never match
