"""The reference's signature computation as a driver-checked query
(SURVEY §1, §8 M4): GTFS schedule → XML realtime passages → as-of match →
delay board — end-to-end, hash-compared against a hand-derived VALUES
oracle.

The fixture is embedded (deterministic literals, no external files) and
covers the hairy cases in one pass: a >24:00:00 GTFS clock, a
calendar_dates-added service, an ambiguous train number stopping twice at
one station (as-of tie-break), UIC 8→7 normalization, delayed/cancelled
status decode, and a scheduled-but-unobserved stop surviving the left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.operators.delays import delay_board
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs
from transilien_api_etl_spark.sources.gtfs import scheduled_departures
from transilien_api_etl_spark.sources.realtime import (
    normalize_passages,
    parse_passages_native,
)

_DAY = "20260102"  # a Friday


def _gtfs(spark: SparkSession) -> dict[str, DataFrame]:
    trips = spark.createDataFrame(
        [
            ("H", "WEEKDAY", "SNCF-123401-H", "POPI"),
            ("H", "WEEKDAY", "SNCF-123403-H", "POPI"),
            ("H", "WEEKEND", "SNCF-555555-H", "VICK"),
            ("H", "SPECIAL", "SNCF-777777-H", "SPEC"),
        ],
        "route_id string, service_id string, trip_id string, trip_headsign string",
    )
    stop_times = spark.createDataFrame(
        [
            ("SNCF-123401-H", "08:00:00", "08:01:00", "8727100", 1),
            ("SNCF-123401-H", "08:14:00", "08:15:00", "8727613", 2),
            ("SNCF-123403-H", "09:00:00", "09:01:00", "8727100", 1),
            ("SNCF-123403-H", "21:00:00", "21:01:00", "8727100", 5),
            ("SNCF-555555-H", "10:00:00", "10:00:00", "8727100", 1),
            ("SNCF-777777-H", "25:10:00", "25:12:00", "8727100", 1),
        ],
        "trip_id string, arrival_time string, departure_time string, stop_id string, stop_sequence int",
    )
    calendar = spark.createDataFrame(
        [
            ("WEEKDAY", 1, 1, 1, 1, 1, 0, 0, "20260101", "20261231"),
            ("WEEKEND", 0, 0, 0, 0, 0, 1, 1, "20260101", "20261231"),
        ],
        "service_id string, monday int, tuesday int, wednesday int, thursday int, "
        "friday int, saturday int, sunday int, start_date string, end_date string",
    )
    calendar_dates = spark.createDataFrame(
        [("SPECIAL", _DAY, 1), ("WEEKDAY", "20260106", 2)],
        "service_id string, date string, exception_type int",
    )
    return {
        "trips": trips,
        "stop_times": stop_times,
        "calendar": calendar,
        "calendar_dates": calendar_dates,
    }


def _passages_xml(spark: SparkSession) -> DataFrame:
    def train(num, date_text, etat=None):
        etat_el = f"<etat>{etat}</etat>" if etat else ""
        return (
            f'<train><date mode="R">{date_text}</date><num>{num}</num>'
            f"<miss>POPI</miss><term>87271007</term>{etat_el}</train>"
        )

    payloads = [
        (
            "87271007",
            '<?xml version="1.0"?><passages gare="87271007">'
            + train("123401", "02/01/2026 08:05", "Retardé")
            + train("123403", "02/01/2026 09:01")
            + train("777777", "03/01/2026 01:15", "Supprimé")
            + "</passages>",
        ),
        (
            "87276133",
            '<?xml version="1.0"?><passages gare="87276133">'
            + train("123401", "02/01/2026 08:15")
            + "</passages>",
        ),
        ("87999999", "<not-xml"),
    ]
    return spark.createDataFrame(payloads, "station string, xml string")


@register(
    "transilien_delay_board",
    doc="End-to-end domain pipeline (SURVEY §1/§8 M4): embedded GTFS feed + "
    "XML passages → scheduled_departures → parse/normalize → as-of match → "
    "left-join delay board. Oracle is the hand-derived expected board as "
    "VALUES — the whole pipeline is hash-checked, not just row counts.",
    tags=("domain", "asof", "gtfs"),
    oracle="""
SELECT * FROM (VALUES
  ('20260102', '8727100', CAST(123401 AS BIGINT), 1, TIMESTAMP '2026-01-02 08:01:00',
   TIMESTAMP '2026-01-02 08:05:00', CAST(240 AS BIGINT), 'delayed'),
  ('20260102', '8727613', CAST(123401 AS BIGINT), 2, TIMESTAMP '2026-01-02 08:15:00',
   TIMESTAMP '2026-01-02 08:15:00', CAST(0 AS BIGINT), 'on_time'),
  ('20260102', '8727100', CAST(123403 AS BIGINT), 1, TIMESTAMP '2026-01-02 09:01:00',
   TIMESTAMP '2026-01-02 09:01:00', CAST(0 AS BIGINT), 'on_time'),
  ('20260102', '8727100', CAST(123403 AS BIGINT), 5, TIMESTAMP '2026-01-02 21:01:00',
   CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT), 'unobserved'),
  ('20260102', '8727100', CAST(777777 AS BIGINT), 1, TIMESTAMP '2026-01-03 01:12:00',
   TIMESTAMP '2026-01-03 01:15:00', CAST(180 AS BIGINT), 'cancelled')
) AS t(service_day, station7, train_num, stop_sequence, scheduled_ts,
       expected_ts, delay_s, status)
ORDER BY station7, train_num, stop_sequence
""",
)
def transilien_delay_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    sched = scheduled_departures(_gtfs(spark), _DAY).withColumnRenamed("stop_id", "station7")
    # JVM-native from_xml path (zero Python crossing); the pandas parser
    # remains the equivalence-tested reference (tests/test_python_datasource.py).
    observed = normalize_passages(parse_passages_native(_passages_xml(spark)))
    board = delay_board(sched, observed)
    return board.select(
        "service_day",
        "station7",
        "train_num",
        "stop_sequence",
        "scheduled_ts",
        "expected_ts",
        "delay_s",
        "status",
    ).orderBy("station7", "train_num", "stop_sequence")


@register(
    "transilien_next_departures",
    doc="The reference's main user-facing query (DBQuerier 'next N "
    "departures of a station, realtime-enriched'): the delay board "
    "filtered to effective departure (realtime if observed, else "
    "scheduled) at/after the asked instant, cancelled trains excluded, "
    "top-2 per station by effective time (W1 over the domain pipeline). "
    "Hand-derived VALUES oracle, like the board itself.",
    tags=("domain", "topk", "window"),
    oracle="""
SELECT * FROM (VALUES
  ('8727100', CAST(1 AS BIGINT), CAST(123403 AS BIGINT),
   TIMESTAMP '2026-01-02 09:01:00', 'on_time'),
  ('8727100', CAST(2 AS BIGINT), CAST(123403 AS BIGINT),
   TIMESTAMP '2026-01-02 21:01:00', 'unobserved')
) AS t(station7, rn, train_num, effective_ts, status)
ORDER BY station7, rn
""",
)
def transilien_next_departures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ensure_query_confs(spark)
    sched = scheduled_departures(_gtfs(spark), _DAY).withColumnRenamed(
        "stop_id", "station7"
    )
    observed = normalize_passages(parse_passages_native(_passages_xml(spark)))
    board = delay_board(sched, observed)
    asked = F.lit("2026-01-02 08:30:00").cast("timestamp")
    eff = F.coalesce(F.col("expected_ts"), F.col("scheduled_ts"))
    w = Window.partitionBy("station7").orderBy(eff.asc(), F.col("train_num").asc())
    return (
        board.filter((F.col("status") != "cancelled") & (eff >= asked))
        .withColumn("effective_ts", eff)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
        .select("station7", "rn", "train_num", "effective_ts", "status")
        .orderBy("station7", "rn")
    )
