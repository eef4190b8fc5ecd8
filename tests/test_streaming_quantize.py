"""Streaming SQ8 encoding with a FROZEN model — the serving-side shape:
the codebook/stats are trained in batch (driver-held literals), then the
encode expression runs unchanged inside a Structured Streaming micro-batch
pipeline. Codes must match the batch encode row-for-row.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.quantize import sq8_encode, sq8_stats_model

SF = "/root/testdata/sf0.001"


def test_streaming_encode_matches_batch(spark):
    emb = load_table(spark, SF, "embeddings")
    mins, maxs = sq8_stats_model(emb)

    batch = {
        r["vec_id"]: list(r["codes"])
        for r in sq8_encode(emb, mins, maxs).select("vec_id", "codes").collect()
    }

    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(SF)
    )
    enc = sq8_encode(stream, mins, maxs).select("vec_id", "codes")
    with tempfile.TemporaryDirectory(prefix="sq8-stream-ckpt-") as ckpt:
        q = (
            enc.writeStream.format("memory")
            .queryName("sq8_stream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in spark.sql("SELECT * FROM sq8_stream").collect()
    }
    assert got == batch
    assert len(got) == emb.count()
    # serving invariant: every code is a byte
    assert all(0 <= c <= 255 for codes in got.values() for c in codes)
