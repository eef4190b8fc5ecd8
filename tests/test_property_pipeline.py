"""Property-based tests for the corpus-engineering and time-series
operators: hypothesis generates adversarial inputs (empty docs, equal
timestamps, single-source corpora) and a reference computation in plain
Python checks the DataFrame result. Pure-logic properties that the
oracle hash comparison (fixed test data) cannot probe."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PACK_BUDGET = 64


def _pack_ref(docs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference packing: doc_id-ordered cumsum-before // budget."""
    out, cum = {}, 0
    for doc_id, n_tok in sorted(docs):
        out[doc_id] = cum // PACK_BUDGET
        cum += n_tok
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 40)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_pack_sequences_assignment_matches_reference(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    got = {
        r.doc_id: r.seq_id
        for r in df.withColumn(
            "seq_id",
            F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / PACK_BUDGET),
        ).collect()
    }
    ref = _pack_ref(docs)
    assert got == ref
    # seq ids are contiguous from 0 and nondecreasing in doc order
    seqs = [ref[d] for d in sorted(ref)]
    assert seqs[0] == 0 and all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))


TS = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 1, 3)
).map(lambda d: d.replace(microsecond=0))


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), TS, st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_resample_ffill_grid_carries_last_observation(spark, events):
    rows = [(uid, i, ts, v) for i, (uid, ts, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")

    bounds = df.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_obs"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    obs = df.select("user_id", "ts", "value", F.lit(1).alias("is_obs"), "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_obs"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = (
        obs.unionByName(grid)
        .withColumn("v", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_obs") == 0)
        .select("user_id", "ts", "v")
        .collect()
    )
    by_user: dict[int, list[tuple[dt.datetime, int, float]]] = {}
    for uid, eid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    for r in got:
        cands = [(ts, eid, v) for ts, eid, v in by_user[r.user_id] if ts <= r.ts]
        want = max(cands)[2] if cands else None
        if want is None:
            assert r.v is None
        else:
            assert r.v is not None and math.isclose(r.v, want, rel_tol=1e-12), (
                r.user_id,
                r.ts,
                r.v,
                want,
            )


@settings(max_examples=10, deadline=None)
@given(
    lts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    rts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    lower=st.integers(min_value=-600, max_value=599),
    span=st.integers(min_value=1, max_value=900),
)
def test_banded_range_join_equals_naive_property(spark, lts, rts, lower, span):
    """For arbitrary event times and window bounds, banding produces the
    exact pair set of the naive interval predicate — each qualifying pair
    meets in exactly one band."""
    import datetime as dt

    from pyspark.sql import functions as F

    from transilien_api_etl_spark.operators.joins import banded_range_join

    upper = lower + span
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(lts)], ["lid", "lts"]
    )
    right = spark.createDataFrame(
        [(j, base + dt.timedelta(seconds=s)) for j, s in enumerate(rts)], ["rid", "rts"]
    )
    got = {
        (r.lid, r.rid)
        for r in banded_range_join(left, right, "lts", "rts", lower, upper)
        .select("lid", "rid")
        .collect()
    }
    want = {
        (i, j)
        for i, ls in enumerate(lts)
        for j, rs in enumerate(rts)
        if ls + lower <= rs <= ls + upper
    }
    assert got == want
