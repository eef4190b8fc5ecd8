"""Checkpoint recovery (SURVEY §3 T1/T5 operational contract): a restarted
streaming query resumes from its checkpoint — already-committed source
files are NOT reprocessed, new files are, and an idempotent foreachBatch
sink ends up exactly-once across the restart.

This is the property that makes the reference's "re-poll and upsert"
loop safe to crash anywhere: offsets live in the checkpoint, the sink
merge is idempotent, so replay cannot double-count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.sources.sinks import upsert_by_key

SF = "/root/testdata/sf0.001"


def _start(spark, src_dir, schema, ckpt, out_path, batches):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src_dir)
    )

    def sink(batch_df, batch_id):
        batches.append(batch_id)
        upsert_by_key(
            batch_df.withColumn("_seen", F.lit(1)),
            out_path,
            key_cols=["event_id"],
            order_col="ts",
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_restart_processes_only_new_files_and_sink_stays_exactly_once(spark, tmp_path):
    e = load_table(spark, SF, "events")
    half_a = e.filter(F.col("event_id") % 2 == 0)
    half_b = e.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    half_a.repartition(2).write.mode("append").parquet(src)
    run1_batches: list[int] = []
    q1 = _start(spark, src, e.schema, ckpt, out, run1_batches)
    q1.awaitTermination()
    n_after_run1 = spark.read.parquet(out).count()
    assert n_after_run1 == half_a.count()
    assert len(run1_batches) >= 2

    # new files arrive while the query is DOWN; restart with the same ckpt
    half_b.repartition(2).write.mode("append").parquet(src)
    run2_batches: list[int] = []
    q2 = _start(spark, src, e.schema, ckpt, out, run2_batches)
    q2.awaitTermination()

    # run 2 resumed AFTER run 1's batches: ids strictly increase, and only
    # the new files were read (2 new files → ≤2 new batches, not 4)
    assert run2_batches and min(run2_batches) > max(run1_batches)
    assert len(run2_batches) <= 2

    final = spark.read.parquet(out)
    assert final.count() == e.count(), "restart lost or duplicated rows"
    assert final.select("event_id").distinct().count() == e.count()
