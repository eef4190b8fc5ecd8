"""Secondary storage formats round-trip through the same engine paths.

SURVEY §3.1 S1/S2 cover parquet + CSV as the primary formats; a reference
user also reaches for ORC (warehouse interchange), JSON lines (API dumps)
and raw binary files (multimodal payload ingest, F11). All four are
built-in Spark sources — these tests pin (a) lossless round-trips under a
DECLARED schema (never inferSchema on the read path), and (b) that
predicate pushdown reaches the ORC scan just like parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from transilien_api_etl_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "lineitem_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    # value-level equality via anti-joins both ways
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("l_orderkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters")[1][:200]


def test_json_lines_roundtrip_declared_schema(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    path = str(tmp_path / "events_json")
    # default timestampFormat truncates to milliseconds — declare a µs
    # format explicitly on BOTH sides (schema + format declared, nothing
    # inferred: the same discipline as the CSV/GTFS path)
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    back = spark.read.schema(schema).option("timestampFormat", ts_fmt).json(path)
    assert back.count() == ev.count()
    # timestamps survive to the microsecond; doubles bit-exactly (JSON
    # writer emits shortest-roundtrip decimal)
    a = ev.select("event_id", "ts", "value", "props")
    b = back.select("event_id", "ts", "value", "props")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_text_and_binary_file_sources(spark, tmp_path):
    docs = load_table(spark, SF, "documents").limit(50)
    txt_dir = str(tmp_path / "docs_txt")
    docs.select("text").coalesce(1).write.mode("overwrite").text(txt_dir)
    lines = spark.read.text(txt_dir)
    assert lines.count() == 50

    # binaryFile: the F11 multimodal ingest path for payload files
    blob_path = tmp_path / "payload.bin"
    payload = bytes(range(256))
    blob_path.write_bytes(payload)
    bf = spark.read.format("binaryFile").load(str(tmp_path / "payload.bin"))
    row = bf.select("length", "content").collect()[0]
    assert row["length"] == 256 and bytes(row["content"]) == payload
    assert os.path.basename(
        bf.select("path").collect()[0]["path"]
    ) == "payload.bin"
