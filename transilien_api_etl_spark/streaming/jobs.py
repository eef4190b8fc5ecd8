"""Streaming building blocks (SURVEY.md §3.9 T1-T8).

``read_events_stream`` is the micro-batch ingest (T1): a file source over
the events parquet with the declared schema — in production the same plan
hangs off a Kafka/HTTP-polling source; the logical plan downstream is
identical, which is the point of Structured Streaming.

``run_stream_to_memory`` drives any streaming DataFrame to completion with
``availableNow`` and returns the materialized result — deterministic, so
streaming plans share the batch plans' DuckDB oracles (SURVEY §6.3).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from transilien_api_etl_spark.io import events_raw_schema, table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (T1).

    ts may arrive as parquet TIMESTAMP(NANOS) (nanosAsLong + integer-DIV
    conversion, same as the batch loader) or standard µs — one footer read
    decides, so batch and stream share one downstream schema either way.
    """
    from pyspark.sql import functions as F

    from transilien_api_etl_spark.io import SCHEMAS, _events_ts_is_nanos

    # file streaming source requires a directory; select just the events
    # table out of it with pathGlobFilter
    if _events_ts_is_nanos(table_path(sf_dir, "events")):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(events_raw_schema())
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def run_stream_to_memory(
    sdf: DataFrame, output_mode: str, name_prefix: str = "stream"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; returns the materialized result as a batch DataFrame."""
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(qname)


def run_stream_foreach_batch(
    sdf: DataFrame, batch_fn, name_prefix: str = "febatch"
) -> None:
    """Drive a stream through a foreachBatch sink to completion (S5/T1)."""
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    q = (
        sdf.writeStream.foreachBatch(batch_fn)
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
