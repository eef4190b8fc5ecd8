"""read_events_stream must handle BOTH at-rest layouts of the events table:
the driver-generated single events.parquet FILE (leaf-glob path) and a
Spark-written events.parquet DIRECTORY of part files (scale cache, any
sink of this engine). The directory case used to stream zero rows
silently: pathGlobFilter matches leaf names, and part-*.parquet never
matches 'events.parquet' (round-5 review finding)."""

from __future__ import annotations

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.streaming.jobs import (
    read_events_stream,
    run_stream_to_memory,
)

SF = "/root/testdata/sf0.001"


def test_file_layout_streams_all_rows(spark):
    got = run_stream_to_memory(
        read_events_stream(spark, SF).select("event_id"), "append", "evfile"
    ).count()
    assert got == load_table(spark, SF, "events").count()


def test_directory_layout_streams_all_rows(spark, tmp_path):
    sf_dir = str(tmp_path)
    e = load_table(spark, SF, "events")
    # µs timestamps, multiple part files — exactly what scale.py and the
    # engine's own sinks write
    e.repartition(3).write.parquet(f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        read_events_stream(spark, sf_dir).select("event_id"), "append", "evdir"
    ).count()
    assert got == e.count()
