"""Model-based test for the S5 idempotent upsert sink: hypothesis drives
random batch sequences through ``upsert_by_key`` (both the whole-table and
the partition-scoped path) and a plain-dict latest-version-wins model
states the expected table after every batch. Probes shapes the fixed
registered query cannot: re-used keys across many batches, versions
arriving out of order, batches touching only one partition (the other
partition's keys must survive the dynamic overwrite untouched).
"""

from __future__ import annotations

import tempfile

from hypothesis import given, settings, strategies as st

from transilien_api_etl_spark.sources.sinks import upsert_by_key

# (key, version) pairs; the payload is derived as f"{key}:{version}" so
# equal-version ties carry identical payloads and the model stays
# deterministic (upsert breaks version ties arbitrarily).
BATCH = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 50)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],  # one row per key per batch, like a real poll
)


@settings(max_examples=6, deadline=None)
@given(batches=st.lists(BATCH, min_size=1, max_size=3))
def test_upsert_by_key_matches_latest_wins_model(spark, batches):
    plain = tempfile.mkdtemp(prefix="upsert_prop_plain_")
    parted = tempfile.mkdtemp(prefix="upsert_prop_part_") + "/t"
    model: dict[int, int] = {}
    for batch in batches:
        rows = [(k, v, f"{k}:{v}", k % 2) for k, v in batch]
        df = spark.createDataFrame(
            rows, "key long, version long, val string, p long"
        )
        upsert_by_key(df, plain, ["key"], "version")
        upsert_by_key(df, parted, ["key"], "version", partition_cols=["p"])
        for k, v in batch:
            model[k] = max(v, model.get(k, v))
        expect = {(k, model[k], f"{k}:{model[k]}", k % 2) for k in model}
        got_plain = {
            (r.key, r.version, r.val, r.p)
            for r in spark.read.parquet(plain).collect()
        }
        assert got_plain == expect
        got_parted = {
            (r.key, r.version, r.val, r.p)
            for r in spark.read.parquet(parted).collect()
        }
        assert got_parted == expect
