"""Schedule ⋈ realtime matching + delay computation — the reference's
signature pipeline (SURVEY.md §1.3-1.4, §3.3 J3/J5/J6, §8 M4).

The reference matches each observed realtime passage to its scheduled
``stop_times`` row on (service day, station, train number) — where the train
number is a digit substring of the GTFS trip_id — then computes
``delay = expected - scheduled`` and flags scheduled-but-never-observed
trains. Re-expressed declaratively:

- ``match_passages``      : equi join on the composite key, with a
  nearest-scheduled-time as-of tie-break when one train number stops twice
  at a station in one service day (J6 recipe: join + window rank).
- ``delay_board``         : LEFT join keeps unobserved scheduled stops
  (delay null ⇒ not yet observed / silently cancelled — the J3/J5 shape).

Scale posture: schedule and observations both arrive hash-partitioned by
the same composite key, so this is one shuffle each side then a sort-merge
join; at Transilien scale the per-day schedule is broadcast-sized and AQE
demotes to a broadcast hash join on its own. The window tie-break partitions
by the same key — no extra shuffle (Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Composite match key: (service day, 7-digit station, train number).
MATCH_KEY = ["service_day", "station7", "train_num"]


def match_passages(scheduled: DataFrame, observed: DataFrame) -> DataFrame:
    """Inner-match observed passages to scheduled stops with as-of tie-break.

    ``scheduled`` needs columns MATCH_KEY + ``scheduled_ts`` (+ any carry
    columns); ``observed`` needs MATCH_KEY + ``expected_ts``. When the equi
    key is ambiguous (same train number twice at a station in one service
    day) the nearest scheduled time wins — ``row_number`` over the absolute
    time gap, deterministic tie-break on ``scheduled_ts``.
    """
    for side, df_ in (("scheduled", scheduled), ("observed", observed)):
        if "_rn" in df_.columns:
            raise ValueError(
                f"match_passages: {side} already has a '_rn' column; rename "
                "it first (internal rank column would overwrite it)"
            )
    joined = observed.join(scheduled, MATCH_KEY, "inner")
    gap = F.abs(F.unix_micros(F.col("expected_ts")) - F.unix_micros(F.col("scheduled_ts")))
    w = Window.partitionBy(*MATCH_KEY, "expected_ts").orderBy(gap.asc(), F.col("scheduled_ts").asc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_delay(matched: DataFrame) -> DataFrame:
    """delay_s = observed expected time − scheduled time, in whole seconds."""
    return matched.withColumn(
        "delay_s",
        ((F.unix_micros(F.col("expected_ts")) - F.unix_micros(F.col("scheduled_ts"))) / 1_000_000)
        .cast("long"),
    )


def delay_board(scheduled: DataFrame, observed: DataFrame) -> DataFrame:
    """Per-scheduled-stop realtime status board (the reference's query-path
    result shape): every scheduled stop for the day, enriched with the
    observed passage where one matched — LEFT join, so unobserved stops keep
    ``delay_s`` null and ``status`` 'unobserved'.

    ``observed`` is normally the union of many realtime polls, so several
    observed passages (distinct ``expected_ts``) can match the SAME
    scheduled stop; the board keeps only the latest poll per scheduled stop
    (freshest prediction), so the left join stays 1:1 and ``delay_stats``
    counts each scheduled stop once.
    """
    if "_poll_rn" in observed.columns or "_poll_rn" in scheduled.columns:
        raise ValueError(
            "delay_board: input already has a '_poll_rn' column; rename it "
            "first (internal rank column would overwrite it)"
        )
    matched = with_delay(match_passages(scheduled, observed))
    w_latest = Window.partitionBy(*MATCH_KEY, "scheduled_ts").orderBy(
        F.col("expected_ts").desc()
    )
    obs = (
        matched.withColumn("_poll_rn", F.row_number().over(w_latest))
        .filter(F.col("_poll_rn") == 1)
        .select(
            *MATCH_KEY,
            "scheduled_ts",
            "expected_ts",
            "delay_s",
            "status",
            "realtime",
        )
    )
    return (
        scheduled.join(obs, [*MATCH_KEY, "scheduled_ts"], "left")
        .withColumn("status", F.coalesce(F.col("status"), F.lit("unobserved")))
    )


def delay_stats(delays: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate delay distribution along any dimension (station/route/day)."""
    return delays.groupBy(*keys).agg(
        F.count("*").alias("n_passages"),
        F.sum(F.when(F.col("status") == "delayed", 1).otherwise(0)).alias("n_delayed"),
        F.sum(F.when(F.col("status") == "cancelled", 1).otherwise(0)).alias("n_cancelled"),
        F.avg("delay_s").alias("avg_delay_s"),
        F.expr("percentile(delay_s, 0.5)").alias("median_delay_s"),
        F.max("delay_s").alias("max_delay_s"),
    )
