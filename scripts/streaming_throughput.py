#!/usr/bin/env python
"""Structured Streaming ingest throughput smoke (BASELINE.md datum).

Replays the amplified events table (10 M rows) through a file-source
availableNow stream into (a) a watermarked tumbling-window count and
(b) a watermarked streaming dedup, memory sink, and reports end-to-end
rows/second from the query progress. This is the engine's real ingest
shape — micro-batch file scans through the incremental planner with state
— not a synthetic rate-source number.

Usage: python scripts/streaming_throughput.py [scale_dir]
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transilien_api_etl_spark.io import TABLES  # noqa: E402,F401
from transilien_api_etl_spark.session import build_session  # noqa: E402

SCALE = sys.argv[1] if len(sys.argv) > 1 else None


def main() -> None:
    spark = build_session(app_name="stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    if SCALE:
        src = os.path.join(SCALE, "events.parquet")
    else:
        from transilien_api_etl_spark.scale import scale_dir_name

        src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_cache",
            scale_dir_name(),
            "events.parquet",
        )
    total = spark.read.parquet(src).count()

    results = {}
    for mode in ("window_count", "dedup"):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "8")
            .parquet(src)
        )
        if dict(stream.dtypes).get("ts") == "bigint":  # nanos-as-long testdata
            # integer DIV, same as io._events_ns_to_ts — float division
            # loses ns precision above 2^53 (~1970+104 days)
            from transilien_api_etl_spark.io import _events_ns_to_ts

            stream = _events_ns_to_ts(stream)
        if mode == "window_count":
            q = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            out_mode = "update"
        else:
            q = stream.withWatermark("ts", "1 hour").dropDuplicates(
                ["user_id", "event_id"]
            )
            out_mode = "append"
        name = f"tp_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        sq = (
            q.writeStream.format("noop")
            .outputMode(out_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"/tmp/tp_ckpt_{name}")
            .start()
        )
        sq.awaitTermination()
        wall = time.perf_counter() - t0
        rows_s = total / wall
        results[mode] = (wall, rows_s)
        print(f"# {mode}: {total} rows in {wall:.1f}s = {rows_s:,.0f} rows/s")
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
