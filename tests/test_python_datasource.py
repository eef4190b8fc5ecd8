"""Custom Python DataSource (PySpark 4 datasource API) for the XML feed:
batch read parity with the mapInPandas parser, partition fan-out by station
chunk, and the streaming poll-cycle reader feeding the normalize stage."""

from __future__ import annotations

import textwrap
import time

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.sources.datasource import register_datasource
from transilien_api_etl_spark.sources.realtime import normalize_passages, parse_passages

STATIONS = [f"8727{i:03d}7" for i in range(6)]


def _xml(station: str, trains: list[str]) -> str:
    return textwrap.dedent(
        f'<?xml version="1.0"?><passages gare="{station}">{"".join(trains)}</passages>'
    )


def _train(num: str, date_text: str, mode: str = "R", etat: str | None = None) -> str:
    etat_el = f"<etat>{etat}</etat>" if etat else ""
    return (
        f'<train><date mode="{mode}">{date_text}</date><num>{num}</num>'
        f"<miss>POPI</miss><term>87271007</term>{etat_el}</train>"
    )


@pytest.fixture(scope="module")
def endpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("xml_endpoint")
    for i, st in enumerate(STATIONS):
        trains = [
            _train(f"10{i}{j}", f"02/01/2026 12:{10 + j:02d}", etat="Retardé" if j == 2 else None)
            for j in range(3)
        ]
        (d / f"{st}.xml").write_text(_xml(st, trains))
    (d / f"{STATIONS[0]}_broken").write_text("not xml")  # ignored: no .xml suffix
    return str(d)


def test_batch_read_matches_mapinpandas_parser(spark, endpoint):
    register_datasource(spark)
    via_ds = (
        spark.read.format("transilien_xml")
        .option("endpoint", endpoint)
        .option("chunk_size", "2")
        .load()
    )
    assert via_ds.rdd.getNumPartitions() == 3  # 6 stations / chunks of 2

    raw = spark.createDataFrame(
        [(st, open(f"{endpoint}/{st}.xml").read()) for st in STATIONS],
        "station string, xml string",
    )
    via_mip = parse_passages(raw)
    key = lambda r: (r.station, r.num)  # noqa: E731
    assert sorted(map(tuple, via_ds.collect())) == sorted(map(tuple, via_mip.collect()))
    assert via_ds.count() == 18

    # the normalize stage composes unchanged on top of the source
    norm = normalize_passages(via_ds)
    delayed = norm.filter(F.col("status") == "delayed")
    assert delayed.count() == 6  # one per station
    assert norm.filter(F.col("station7") == "8727000").count() == 3


def test_stream_reader_polls_cycles(spark, endpoint, tmp_path):
    register_datasource(spark)
    stream = (
        spark.readStream.format("transilien_xml")
        .option("endpoint", endpoint)
        .option("chunk_size", "3")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("xml_poll")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM xml_poll").first().c >= 36:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) c FROM xml_poll").first().c
    assert n >= 36, f"expected >=2 poll cycles (36 rows), got {n}"
    assert n % 18 == 0, f"partial poll cycle leaked: {n} rows"
    # repeated polls dedup to one row per (station, num) — the T6 shape
    dedup = spark.sql("SELECT count(DISTINCT station || '/' || num) c FROM xml_poll").first().c
    assert dedup == 18


def test_native_from_xml_parser_matches_pandas_parser(spark):
    from transilien_api_etl_spark.sources.realtime import (
        parse_passages,
        parse_passages_native,
    )

    payloads = [
        (
            "87271007",
            _xml(
                "87271007",
                [
                    '<train><date mode="R">02/01/2026 08:05</date><num>123456</num>'
                    "<miss>POPI</miss><term>87384008</term><etat>Retardé</etat></train>",
                    '<train><date mode="T">02/01/2026 08:20</date><num>654321</num>'
                    "<miss>NOPE</miss><term>87384008</term></train>",
                ],
            ),
        ),
        ("87999999", "<not-xml"),  # malformed → dropped by both parsers
        ("87000000", None),  # null payload → dropped by both parsers
    ]
    raw = spark.createDataFrame(payloads, "station string, xml string")
    cols = ["station", "num", "miss", "term", "date_text", "mode", "etat"]
    ref = sorted(tuple(r) for r in parse_passages(raw).select(cols).collect())
    nat = sorted(tuple(r) for r in parse_passages_native(raw).select(cols).collect())
    assert nat == ref
    assert len(nat) == 2
