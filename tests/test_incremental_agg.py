"""Incremental aggregate maintenance: 8 micro-batches of deltas folded into
a stored aggregate must equal the one-shot batch aggregate, and replaying a
micro-batch (foreachBatch's crash-redelivery contract) must be a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.incremental import (
    merge_additive_agg,
    read_additive_agg,
)

SF = "/root/testdata/sf0.01"
KEYS = ["event_type"]


def _expected(e):
    return {
        r.event_type: (r.n, round(r.total, 2))
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }


def test_incremental_merge_equals_batch_and_replay_is_noop(spark, tmp_path):
    e = load_table(spark, SF, "events").withColumn(
        "slice", F.pmod(F.col("event_id"), F.lit(8))
    )
    path = str(tmp_path / "agg")

    batches = [
        e.filter(F.col("slice") == i).drop("slice").localCheckpoint(eager=True)
        for i in range(8)
    ]
    for i, b in enumerate(batches):
        merge_additive_agg(b, i, path, KEYS, sum_cols={"value": "total"})

    got = {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    }
    assert got == _expected(e.drop("slice"))

    # replay the LAST batch (the crash-redelivery case): must change nothing
    merge_additive_agg(batches[7], 7, path, KEYS, sum_cols={"value": "total"})
    replayed = {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    }
    assert replayed == got

    # stale replay of an EARLY batch: also a no-op
    merge_additive_agg(batches[2], 2, path, KEYS, sum_cols={"value": "total"})
    assert {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    } == got


def test_incremental_merge_via_streaming_foreachbatch(spark, tmp_path):
    """End-to-end: the merge driven by an actual foreachBatch stream over 4
    file-sliced micro-batches equals the batch aggregate."""
    e = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    e.repartition(4).write.parquet(src)
    path = str(tmp_path / "agg_stream")

    stream = (
        spark.readStream.schema(e.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_additive_agg(
                df, bid, path, KEYS, sum_cols={"value": "total"}
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    }
    assert got == _expected(e)


def test_crash_before_manifest_swap_preserves_previous_version(spark, tmp_path):
    """ADVICE r2: a crash between the version write and the manifest swap
    must leave the previous aggregate fully readable, and the replayed
    batch must converge to the correct state (no history loss, no silent
    restart-from-one-delta)."""
    import transilien_api_etl_spark.operators.incremental as inc

    e = load_table(spark, SF, "events").withColumn(
        "slice", F.pmod(F.col("event_id"), F.lit(2))
    )
    b0 = e.filter(F.col("slice") == 0).drop("slice").localCheckpoint(eager=True)
    b1 = e.filter(F.col("slice") == 1).drop("slice").localCheckpoint(eager=True)
    path = str(tmp_path / "agg_crash")

    merge_additive_agg(b0, 0, path, KEYS, sum_cols={"value": "total"})
    after_b0 = {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    }

    # crash injection: batch 1 writes its version dir, dies before the swap
    real_swap = inc._swap_manifest
    inc._swap_manifest = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    try:
        try:
            merge_additive_agg(b1, 1, path, KEYS, sum_cols={"value": "total"})
        except OSError:
            pass
        # previous version is still live and complete
        assert {
            r.event_type: (r.n, round(r.total, 2))
            for r in read_additive_agg(spark, path).collect()
        } == after_b0
    finally:
        inc._swap_manifest = real_swap

    # foreachBatch redelivers batch 1: the half-written v=1 is overwritten
    merge_additive_agg(b1, 1, path, KEYS, sum_cols={"value": "total"})
    assert {
        r.event_type: (r.n, round(r.total, 2))
        for r in read_additive_agg(spark, path).collect()
    } == _expected(e.drop("slice"))


def test_corrupt_manifest_refuses_instead_of_resetting(spark, tmp_path):
    """Review fix: a manifest that exists but is unreadable (torn write)
    must raise, not silently restart history from one delta."""
    import pytest

    import transilien_api_etl_spark.operators.incremental as inc

    e = load_table(spark, SF, "events").limit(100).localCheckpoint(eager=True)
    path = str(tmp_path / "agg_corrupt")
    merge_additive_agg(e, 0, path, KEYS, sum_cols={"value": "total"})
    with open(inc._manifest_file(path), "w", encoding="utf-8") as fh:
        fh.write("")  # simulate a zero-length manifest after power loss
    with pytest.raises(RuntimeError, match="corrupt aggregate manifest"):
        merge_additive_agg(e, 1, path, KEYS, sum_cols={"value": "total"})
    with pytest.raises(RuntimeError, match="corrupt aggregate manifest"):
        read_additive_agg(spark, path)


def test_retain_versions_widens_reader_grace(spark, tmp_path):
    """ADVICE r3: retain_versions keeps the newest N version dirs across
    swaps (reader-grace window); default 2 keeps new + previous only."""
    import os

    from transilien_api_etl_spark.operators.incremental import merge_additive_agg

    store = str(tmp_path / "agg3")
    for b in range(1, 5):
        batch = spark.createDataFrame([("k", b)], "key string, v int")
        merge_additive_agg(batch, b, store, keys=["key"], sum_cols={"v": "sum_v"},
                           retain_versions=3)
    vers = sorted(e for e in os.listdir(store) if e.startswith("v="))
    assert vers == ["v=2", "v=3", "v=4"]

    store2 = str(tmp_path / "agg2")
    for b in range(1, 5):
        batch = spark.createDataFrame([("k", b)], "key string, v int")
        merge_additive_agg(batch, b, store2, keys=["key"], sum_cols={"v": "sum_v"})
    vers2 = sorted(e for e in os.listdir(store2) if e.startswith("v="))
    assert vers2 == ["v=3", "v=4"]
