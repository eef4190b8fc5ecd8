"""Streaming plans — SURVEY.md §3.9 (M5), run with availableNow so the
driver can hash-compare them against the SAME DuckDB oracles as their batch
twins. Structured Streaming incrementalizes the identical logical plan, so
batch == stream results is a property we *verify*, not assume (SURVEY §6.3).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table, materialize_small
from transilien_api_etl_spark.operators.dedup import exact_dedup
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs
from transilien_api_etl_spark.streaming.jobs import (
    read_events_stream,
    run_stream_foreach_batch,
    run_stream_to_memory,
)


@register(
    "streaming_tumbling_1h",
    doc="T2 streaming twin of events_tumbling_1h: event-time tumbling window "
    "agg over the micro-batch file source, complete mode, availableNow. "
    "Shares the batch oracle.",
    tags=("streaming",),
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return run_stream_to_memory(agg, "complete", "tumbling").orderBy(
        "window_start", "event_type"
    )


@register(
    "streaming_dedup_keys",
    doc="T5/T6: watermark + streaming dropDuplicates on (user_id, event_type); "
    "append mode. Output keys only, so the survivor row's identity (which is "
    "arrival-order-dependent) can't perturb the hash. Oracle: DISTINCT keys.",
    tags=("streaming",),
    oracle="""
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
""",
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    dedup = (
        s.withWatermark("ts", "10 minutes")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_memory(dedup, "append", "dedup").orderBy("user_id", "event_type")


@register(
    "streaming_stream_static_join",
    doc="T8: streaming events ⋈ static customer dimension (broadcast), then "
    "windowless global agg per segment, complete mode.",
    tags=("streaming",),
    oracle="""
SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    agg = (
        s.join(F.broadcast(cust), s.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    return run_stream_to_memory(agg, "complete", "ssj").orderBy("c_mktsegment")


@register(
    "events_session_window",
    doc="T4: native session_window (30-minute gap) in batch mode — merged "
    "windows [min_ts, max_ts+gap); oracle derives the same sessions via the "
    "lag-gap recipe, proving the two sessionization paths agree.",
    tags=("events", "session"),
    oracle="""
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "streaming_upsert_foreachbatch",
    doc="S5/T1: idempotent key-value sink via foreachBatch — each micro-batch "
    "appends to a staging dir; read-back dedups keep-first per key "
    "(the reference's DynamoDB same-key-overwrite semantics, made "
    "deterministic). Oracle: earliest event per (user_id, event_type).",
    tags=("streaming", "sink"),
    oracle="""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id, event_type
""",
)
def streaming_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix=f"upsert_{uuid.uuid4().hex[:8]}_")

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        # per-batch DETERMINISTIC keep-earliest (dropDuplicates would keep an
        # arbitrary row and could discard the global earliest), then append;
        # the global merge at read takes min-of-batch-mins == global min.
        (
            exact_dedup(
                batch_df.select("user_id", "event_type", "event_id", "ts"),
                ["user_id", "event_type"],
                [F.asc("ts"), F.asc("event_id")],
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    try:
        run_stream_foreach_batch(s, upsert, "upsert")
        merged = spark.read.parquet(out_dir)
        result = (
            exact_dedup(
                merged, ["user_id", "event_type"], [F.asc("ts"), F.asc("event_id")]
            )
            .select("user_id", "event_type", "event_id", "ts")
            .orderBy("user_id", "event_type")
        )
        # Materialize before the staging dir is deleted (the warehouse_q
        # pattern) — the returned frame must stay valid for the driver's
        # collect(), and leaving one mkdtemp per run accumulates in /tmp.
        # O(distinct users × event types) result — grows with SF, so this
        # site gets the raised-but-still-hard 2M cap.
        return materialize_small(result, max_rows=2_000_000)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "streaming_session_window",
    doc="T4 streaming twin of events_session_window: native session_window "
    "over the micro-batch source with a watermark (session state evicts "
    "once the watermark passes a session's close). Shares the batch "
    "lag-gap oracle — streaming/batch equivalence for merged windows.",
    tags=("streaming", "session"),
    oracle="""
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    return run_stream_to_memory(agg, "complete", "sessionwin").orderBy(
        "user_id", "session_start"
    )


@register(
    "streaming_sliding_10m_5m",
    doc="T3 streaming twin of events_sliding_10m_5m: overlapping windows "
    "over the micro-batch source, complete mode. Shares the batch oracle.",
    tags=("streaming",),
    oracle="""
WITH ws AS (
  SELECT event_type, value,
         make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS w0
  FROM events
), ex AS (
  SELECT event_type, value, w0 AS window_start FROM ws
  UNION ALL
  SELECT event_type, value, w0 - INTERVAL 5 MINUTE FROM ws
)
SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM ex GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return run_stream_to_memory(agg, "complete", "sliding").orderBy(
        "window_start", "event_type"
    )


@register(
    "streaming_stream_stream_join",
    doc="Stream-stream inner join with watermarks (beyond T8's stream-static "
    "form): purchase stream ⋈ click stream per user within a 30-minute "
    "window after the click. Both sides watermarked so join state evicts; "
    "oracle is the equivalent batch range join.",
    tags=("streaming", "join"),
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
ORDER BY purchase_id, click_id
""",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "click_ts", "purchase_ts")
    return run_stream_to_memory(joined, "append", "ssjoin").orderBy(
        "purchase_id", "click_id"
    )


@register(
    "streaming_incremental_agg",
    doc="Incremental aggregate maintenance as a streaming job (S5+T1, the "
    "streaming-warehouse pattern): foreachBatch folds each micro-batch's "
    "pre-aggregated delta into a stored additive group-by via "
    "operators/incremental.merge_additive_agg (batch-id ledger makes "
    "crash-replays no-ops). The final stored table must equal the one-shot "
    "batch aggregate — which is the oracle.",
    tags=("streaming", "sink", "agg"),
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def streaming_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    from transilien_api_etl_spark.operators.incremental import (
        merge_additive_agg,
        read_additive_agg,
    )

    s = read_events_stream(spark, sf_dir)
    agg_dir = tempfile.mkdtemp(prefix=f"incagg_{uuid.uuid4().hex[:8]}_")
    try:
        run_stream_foreach_batch(
            s,
            lambda df, bid: merge_additive_agg(
                df, bid, agg_dir, ["event_type"], sum_cols={"value": "total"}
            ),
            "incagg",
        )
        result = (
            read_additive_agg(spark, agg_dir)
            .select("event_type", "n", F.round("total", 2).alias("total"))
            .orderBy("event_type")
        )
        # materialize-then-clean (warehouse_q pattern): no /tmp leak per run
        return materialize_small(result)
    finally:
        shutil.rmtree(agg_dir, ignore_errors=True)


@register(
    "streaming_stream_stream_left_join",
    doc="Stream-stream LEFT OUTER join with watermark-driven null emission "
    "(the hard half of T8+): each click left-joined to purchases in the "
    "30 minutes after it. A null-padded row may only emit once the "
    "watermark PROVES no purchase can still arrive, so the oracle keeps "
    "matched rows unconditionally and unmatched rows only when the click's "
    "join window closed before end-of-stream (watermark delay 0s ⇒ final "
    "watermark = max event time — same contract the timer-sessionizer "
    "leans on).",
    tags=("streaming", "join", "outer"),
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM events c LEFT JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click'
  AND (p.event_id IS NOT NULL
       OR c.ts + INTERVAL 30 MINUTE < (SELECT max(ts) FROM events))
ORDER BY click_id, purchase_id
""",
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "0 seconds")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "0 seconds")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    return run_stream_to_memory(joined, "append", "ssljoin").orderBy(
        "click_id", "purchase_id"
    )


@register(
    "streaming_chained_windows",
    doc="Chained stateful window aggregations in ONE streaming query "
    "(Spark 3.5+ multi-stateful-operator support via window_time): 10-min "
    "tumbling event counts re-aggregated into hourly min/max/avg of the "
    "10-min buckets — the streaming rollup cascade that previously needed "
    "two jobs and an intermediate topic. Oracle is the identical two-level "
    "batch aggregation.",
    tags=("streaming", "window-agg", "chained"),
    oracle="""
WITH ten AS (
  SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w10, count(*) AS n
  FROM events GROUP BY 1
  -- append-mode closure: a window only emits once the watermark (= max
  -- event time at end-of-stream) has passed its END; unclosed tails stay
  -- in state. Mirrored at both levels.
  HAVING time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE
           <= (SELECT max(ts) FROM events)
)
SELECT time_bucket(INTERVAL 1 HOUR, w10) AS hour_start,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(n) AS BIGINT) AS min_10m,
       CAST(max(n) AS BIGINT) AS max_10m,
       CAST(sum(n) AS BIGINT) AS total
FROM ten
GROUP BY 1
HAVING time_bucket(INTERVAL 1 HOUR, w10) + INTERVAL 1 HOUR
         <= (SELECT max(ts) FROM events)
ORDER BY hour_start
""",
)
def streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = read_events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
    ten = s.groupBy(F.window("ts", "10 minutes").alias("w10")).agg(
        F.count(F.lit(1)).alias("n")
    )
    hourly = (
        ten.groupBy(F.window(F.window_time("w10"), "1 hour").alias("wh"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("n").cast("long").alias("min_10m"),
            F.max("n").cast("long").alias("max_10m"),
            F.sum("n").cast("long").alias("total"),
        )
    )
    out = hourly.select(
        F.col("wh.start").alias("hour_start"),
        "n_buckets",
        "min_10m",
        "max_10m",
        "total",
    )
    return run_stream_to_memory(out, "append", "chained").orderBy("hour_start")


@register(
    "streaming_incremental_dedup",
    doc="First-seen-wins corpus dedup as a streaming sink (S5+T6, the "
    "front door of a continuously-ingesting training-data pipeline): "
    "foreachBatch appends only rows whose content digest no earlier "
    "batch has seen (operators/incremental.merge_seen_dedup — "
    "partition-ledger replay protection, digest-only anti-join probe). "
    "The final stored corpus must equal the one-shot keep-first batch "
    "dedup, which is the oracle.",
    tags=("streaming", "sink", "dedup"),
    oracle="""
SELECT event_id, user_id, event_type, value FROM (
  SELECT event_id, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type, value
                            ORDER BY event_id) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY event_id
""",
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    from transilien_api_etl_spark.operators.incremental import (
        merge_seen_dedup,
        read_seen_dedup,
    )

    s = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    # A NOT-yet-existing subpath: mkdtemp pre-creating the corpus dir made
    # batch 0 read an existing-empty dir (UNABLE_TO_INFER_SCHEMA), which
    # merge_seen_dedup used to re-raise, killing the stream (round-4 red).
    root_dir = tempfile.mkdtemp(prefix=f"incdedup_{uuid.uuid4().hex[:8]}_")
    corpus_dir = os.path.join(root_dir, "corpus")
    try:
        run_stream_foreach_batch(
            s,
            lambda df, bid: merge_seen_dedup(
                df, bid, corpus_dir, ["user_id", "event_type", "value"], "event_id"
            ),
            "incdedup",
        )
        result = read_seen_dedup(spark, corpus_dir).orderBy("event_id")
        # materialize-then-clean (warehouse_q pattern): no /tmp leak per
        # run. The deduped corpus is O(distinct events) — 99.9k rows at
        # sf0.1, a hair under the helper's default cap — so this site
        # gets an explicit 2M cap: still a hard bound (few-MB driver
        # transfer at worst), but one the harness's largest SF cannot
        # graze by regenerated-fixture luck.
        return materialize_small(result, max_rows=2_000_000)
    finally:
        shutil.rmtree(root_dir, ignore_errors=True)


@register(
    "streaming_pit_rate_join",
    doc="Streaming point-in-time enrichment (T8 × the feature-store "
    "as-of): each streamed event picks the VERSION of a slowly-changing "
    "rate table in force at its own event time (banded join on a "
    "broadcast static side — the non-equi condition is free because the "
    "history is dimension-sized), then aggregates enriched value per "
    "type. No future leakage: an event before a version's valid_from "
    "cannot see it. Oracle is the identical banded join in SQL.",
    tags=("streaming", "join", "asof", "scd"),
    oracle="""
WITH rates(event_type, valid_from, valid_to, mult) AS (VALUES
  ('click',    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-15 00:00:00', 1.0),
  ('click',    TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '9999-12-31 00:00:00', 1.5),
  ('purchase', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00', 2.0),
  ('purchase', TIMESTAMP '2024-02-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00', 2.5),
  ('view',     TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00', 0.5))
SELECT e.event_type, r.mult,
       count(*) AS n,
       round(sum(e.value * r.mult), 2) AS weighted
FROM events e
JOIN rates r
  ON e.event_type = r.event_type
 AND e.ts >= r.valid_from AND e.ts < r.valid_to
GROUP BY e.event_type, r.mult
ORDER BY e.event_type, mult
""",
)
def streaming_pit_rate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    rates = spark.createDataFrame(
        [
            ("click", "2024-01-01 00:00:00", "2024-01-15 00:00:00", 1.0),
            ("click", "2024-01-15 00:00:00", "9999-12-31 00:00:00", 1.5),
            ("purchase", "2024-01-01 00:00:00", "2024-02-01 00:00:00", 2.0),
            ("purchase", "2024-02-01 00:00:00", "9999-12-31 00:00:00", 2.5),
            ("view", "2024-01-01 00:00:00", "9999-12-31 00:00:00", 0.5),
        ],
        "event_type string, valid_from string, valid_to string, mult double",
    ).select(
        "event_type",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "mult",
    )
    s = read_events_stream(spark, sf_dir)
    enriched = s.alias("e").join(
        F.broadcast(rates).alias("r"),
        (F.col("e.event_type") == F.col("r.event_type"))
        & (F.col("e.ts") >= F.col("r.valid_from"))
        & (F.col("e.ts") < F.col("r.valid_to")),
    )
    agg = (
        enriched.groupBy(F.col("e.event_type").alias("event_type"), "mult")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("e.value") * F.col("mult")), 2).alias("weighted"),
        )
    )
    out = run_stream_to_memory(agg, "complete", "pitrate")
    return out.orderBy("event_type", "mult")
