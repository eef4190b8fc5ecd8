"""Multi-micro-batch equivalence (SURVEY §6.3, stronger form): the same
aggregation produces identical results whether the events table arrives as
ONE batch or as EIGHT micro-batches (maxFilesPerTrigger=1) — i.e. the
windowed state really accumulates across triggers instead of degenerating
to a single-batch pass."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.streaming.jobs import run_stream_to_memory

SF = "/root/testdata/sf0.01"


def test_tumbling_agg_across_eight_micro_batches(spark, tmp_path):
    e = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "events_split")
    e.repartition(8).write.parquet(src_dir)  # 8 files → 8 triggers

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"inc_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 7, (
        f"expected >=8 micro-batches, got batchId={q.lastProgress['batchId']}"
    )
    streamed = {
        (r.ws, r.event_type): (r.n, r.total_value)
        for r in spark.table(q.name).collect()
    }
    batch = {
        (r.ws, r.event_type): (r.n, r.total_value)
        for r in e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
        .collect()
    }
    assert streamed == batch and len(batch) > 100


def test_session_timeout_flush_across_time_sliced_batches(spark, tmp_path):
    """The timer-driven sessionizer must produce the SAME closed-session set
    whether events arrive as one batch or as 8 time-ordered micro-batches —
    sessions spanning batch boundaries stay buffered until the watermark
    proves them closed, then flush exactly once (append mode)."""
    import time

    from pyspark.sql.window import Window

    from transilien_api_etl_spark.streaming.jobs import sessionize_with_timeout

    e = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "events_sliced")
    # 8 contiguous TIME slices written oldest-first: the file source picks
    # them up in modification-time order, so batch k+1 never carries events
    # older than batch k's watermark (a real poller's arrival order).
    sliced = e.withColumn(
        "slice", F.ntile(8).over(Window.orderBy("ts"))
    )
    for i in range(1, 9):
        sliced.filter(F.col("slice") == i).drop("slice").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(0.05)  # distinct file mtimes → deterministic pickup order

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = sessionize_with_timeout(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_sliced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 7, q.lastProgress

    got = {
        (r.user_id, r.session_start, r.session_last, r.n_events)
        for r in spark.table("sess_sliced").collect()
    }
    # single-batch reference over the same data (the registered query's path)
    from transilien_api_etl_spark.plans.registry import REGISTRY

    want = {
        (r.user_id, r.session_start, r.session_last, r.n_events)
        for r in REGISTRY["streaming_session_timeout_flush"].fn(spark, SF).collect()
    }
    assert got == want and len(want) > 1000
