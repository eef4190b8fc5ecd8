"""Streaming state introspection (ops posture): the `statestore` and
`state-metadata` batch readers open a checkpoint's state as DataFrames —
how you debug a misbehaving 100 TB streaming job (inspect hot keys, audit
watermark state) without replaying it."""

from __future__ import annotations

import os
import tempfile


def test_statestore_reader_exposes_aggregation_state(spark):
    d = tempfile.mkdtemp(prefix="state-reader-")
    src, ck = os.path.join(d, "in"), os.path.join(d, "ck")
    df = spark.createDataFrame(
        [(i % 7, float(i)) for i in range(100)], "k int, v double"
    )
    df.write.parquet(src)
    s = spark.readStream.schema("k int, v double").parquet(src)
    q = (
        s.groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("state_reader_agg")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    state = spark.read.format("statestore").load(ck)
    got = {r["key"]["k"]: r["value"]["count"] for r in state.collect()}
    expected = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == expected

    md = spark.read.format("state-metadata").load(ck).collect()
    assert len(md) == 1
    assert md[0]["operatorName"] == "stateStoreSave"
    assert md[0]["maxBatchId"] >= 0
