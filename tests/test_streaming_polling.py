"""T1 polling micro-batch simulation (SURVEY §3.9): the reference's 2-min
Celery cycle re-expressed as a Structured Streaming trigger loop — each
micro-batch 'polls' (generates an XML payload), parses it through the real
realtime source, and idempotently upserts per passage key.

Rate source at a compressed trigger interval; we wait for ≥3 micro-batches
so the loop (not just one batch) is exercised, then assert latest-wins
upsert semantics across batches.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from transilien_api_etl_spark.sources.realtime import normalize_passages, parse_passages
from transilien_api_etl_spark.sources.sinks import upsert_by_key


def test_polling_cycle_multi_batch_upsert(spark, tmp_path):
    out = str(tmp_path / "passages")
    ckpt = str(tmp_path / "ckpt")
    seen_batches: list[int] = []

    def poll_and_upsert(batch_df, batch_id: int) -> None:
        # 'poll': one XML payload per trigger; expected time advances with
        # the batch id so later polls overwrite earlier ones per key
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        minute = int(batch_id) % 60
        xml = (
            '<?xml version="1.0"?><passages gare="87271007">'
            f'<train><date mode="R">02/01/2026 08:{minute:02d}</date>'
            "<num>123401</num><miss>POPI</miss><term>87271007</term></train>"
            "</passages>"
        )
        raw = s.createDataFrame([("87271007", xml)], "station string, xml string")
        passages = normalize_passages(parse_passages(raw)).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        upsert_by_key(passages, out, ["station", "num"], "batch_id")
        seen_batches.append(int(batch_id))

    stream = spark.readStream.format("rate").option("rowsPerSecond", "4").load()
    q = (
        stream.writeStream.foreachBatch(poll_and_upsert)
        .queryName(f"poll_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while len(seen_batches) < 3 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    assert len(seen_batches) >= 3, f"only {len(seen_batches)} micro-batches ran"
    final = spark.read.parquet(out).collect()
    # latest-wins: exactly one row per (station, num), from the max batch id
    assert len(final) == 1
    row = final[0]
    assert row.batch_id == max(seen_batches)
    assert row.station == "87271007" and row.num == "123401"
    assert row.status == "on_time" and row.service_day == "20260102"
