"""Product-analytics composites over the events stream — SURVEY.md §3 A/W/J
applications (cohort retention, time-weighted averages, multi-touch
attribution, A/B moment tests, order-statistics windows).

These are the analyses the reference's downstream dashboards run on the
matched realtime feed (delay cohorts per service week, time-weighted delay
exposure, per-line A/B before/after comparisons), re-keyed onto the synthetic
``events`` table. Each is a pure-DataFrame plan: one or two shuffles, no
Python crossing, every computed column aliased identically to its oracle.

Reproducibility follows the house rules (registry docstring + FIXTURES.md):
money-like doubles accumulate as exact cent-integers in DECIMAL(38,0)
wherever a sum feeds a division; raw doubles are only ever order-compared
(min/max/median) or summed behind a coarse round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "events_cohort_retention",
    doc="Weekly cohort-retention triangle (SURVEY §3 A1/W4 composite): "
    "cohort = Monday-truncated week of the user's first event, offset = "
    "whole weeks since, retained = distinct active users; retention_pct "
    "normalizes by the cohort's own offset-0 size via a window over the "
    "finished aggregate (touches cohort_count rows, not events). Scale "
    "posture: one shuffle on user_id (window min reuses the exchange of "
    "nothing — cohort assignment rides a Window, not a self-join), one "
    "shuffle for the (cohort, offset) rollup; the normalizing window runs "
    "on ~weeks² rows.",
    tags=("events", "analytics", "window-agg"),
    oracle="""
WITH c AS (
  SELECT user_id, ts,
         date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week
  FROM events),
a AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, date_trunc('week', ts)) // 7 AS BIGINT)
           AS week_offset,
         count(DISTINCT user_id) AS n_users
  FROM c GROUP BY 1, 2)
SELECT cohort_week, week_offset, n_users,
       round(n_users * 100.0 /
             max(CASE WHEN week_offset = 0 THEN n_users END)
               OVER (PARTITION BY cohort_week), 4) AS retention_pct
FROM a
ORDER BY cohort_week, week_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.min("ts").over(Window.partitionBy("user_id")))
    c = e.select("user_id", "ts", wk.alias("cohort_week"))
    a = (
        c.groupBy(
            "cohort_week",
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("cohort_week")
    )
    return a.select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(F.col("n_users") * 100.0 / base, 4).alias("retention_pct"),
    ).orderBy("cohort_week", "week_offset")


@register(
    "events_twap",
    doc="Time-weighted average value per user-day over the irregularly "
    "sampled stream (SURVEY §3 W2/A1 composite — the reference weights "
    "delay exposure by how long each prediction was the live one): each "
    "event's value holds until the user's next event that day; "
    "twap = Σ(value·Δt)/ΣΔt. Exact-arithmetic parity: value → cents "
    "BIGINT, Δt → µs BIGINT (product ≤ 4.3e15 < 2⁶³), Σ in "
    "DECIMAL(38,0); only the final division runs in double. Single "
    "shuffle on user_id; the day split re-uses the same sort.",
    tags=("events", "analytics", "window-lag"),
    oracle="""
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day, ts,
         CAST(round(value * 100) AS BIGINT) AS yc,
         epoch_us(lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                 ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
  FROM events),
m AS (
  SELECT user_id, day, count(*) AS n_events,
         CAST(sum(CAST(yc AS DECIMAL(38,0)) * dt_us) AS DOUBLE) AS num,
         CAST(sum(CAST(dt_us AS DECIMAL(38,0))) AS DOUBLE) AS den
  FROM d WHERE dt_us IS NOT NULL GROUP BY user_id, day)
SELECT user_id, day, n_events, round(num / den / 100, 6) AS twap
FROM m WHERE den > 0
ORDER BY user_id, day
""",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    d = e.select(
        "user_id",
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    m = d.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("yc").cast("decimal(38,0)") * F.col("dt_us")).cast("double").alias("num"),
        F.sum(F.col("dt_us").cast("decimal(38,0)")).cast("double").alias("den"),
    )
    return (
        m.filter(F.col("den") > 0)
        .select("user_id", "day", "n_events", F.round(F.col("num") / F.col("den") / 100, 6).alias("twap"))
        .orderBy("user_id", "day")
    )


@register(
    "attribution_linear_touch",
    doc="Linear multi-touch attribution (SURVEY §3 J7 application): every "
    "click by the same user in the 30 minutes up to a purchase shares the "
    "purchase value equally (credit = value / n_touches, accumulated as "
    "exact micro-credit integers in DECIMAL so the rollup is sum-order "
    "independent); per-user rollup of credited touches and attributed "
    "revenue. The join is equi on "
    "user_id with a range residual — sort-merge on user_id, so at 100 TB "
    "it co-partitions with every other user_id-keyed stage; per-purchase "
    "touch counts ride a window over the join output, no second join.",
    tags=("events", "analytics", "range-join"),
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.pid, p.user_id, p.value,
         count(*) OVER (PARTITION BY p.pid) AS n_touches
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE)
SELECT user_id,
       CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
       CAST(count(*) AS BIGINT) AS n_credits,
       round(CAST(sum(CAST(round(value * 1000000 / n_touches) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1000000, 2) AS attributed_value
FROM j GROUP BY user_id
ORDER BY user_id
""",
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts", "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("ts"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).withColumn("n_touches", F.count(F.lit(1)).over(Window.partitionBy("pid")))
    return (
        j.groupBy("user_id")
        .agg(
            F.countDistinct("pid").alias("n_purchases"),
            F.count(F.lit(1)).alias("n_credits"),
            F.round(
                F.sum(
                    F.round(F.col("value") * 1000000 / F.col("n_touches")).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / 1000000,
                2,
            ).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_ab_welch_ttest",
    doc="Welch's two-sample t-test, clicks vs purchases (SURVEY §3 A1 "
    "statistics application — the reference's before/after line-change "
    "delay comparison): one conditional-aggregation pass accumulates n, "
    "Σy, Σy² per arm as exact cent-integers in DECIMAL(38,0) (same "
    "reproducibility argument as agg_moment_stats); the t statistic and "
    "Welch–Satterthwaite df evaluate in double on the 1-row aggregate. "
    "Single map-side-combinable shuffle, 1-row result.",
    tags=("agg", "stats", "analytics"),
    oracle="""
WITH y AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS yc
  FROM events WHERE event_type IN ('click', 'purchase')),
m AS (
  SELECT
    count(*) FILTER (WHERE event_type = 'click') AS n_a,
    count(*) FILTER (WHERE event_type = 'purchase') AS n_b,
    CAST(sum(CAST(yc AS DECIMAL(38,0))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS s1a,
    CAST(sum(CAST(yc * yc AS DECIMAL(38,0))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS s2a,
    CAST(sum(CAST(yc AS DECIMAL(38,0))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS s1b,
    CAST(sum(CAST(yc * yc AS DECIMAL(38,0))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS s2b
  FROM y)
SELECT n_a, n_b,
       round(s1a / n_a / 100, 6) AS mean_a,
       round(s1b / n_b / 100, 6) AS mean_b,
       round((s1a / n_a - s1b / n_b)
             / sqrt((s2a - s1a * s1a / n_a) / (n_a - 1) / n_a
                    + (s2b - s1b * s1b / n_b) / (n_b - 1) / n_b), 6) AS t_stat,
       round(pow((s2a - s1a * s1a / n_a) / (n_a - 1) / n_a
                 + (s2b - s1b * s1b / n_b) / (n_b - 1) / n_b, 2)
             / (pow((s2a - s1a * s1a / n_a) / (n_a - 1) / n_a, 2) / (n_a - 1)
                + pow((s2b - s1b * s1b / n_b) / (n_b - 1) / n_b, 2) / (n_b - 1)), 3)
         AS welch_df
FROM m
""",
)
def agg_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    yc = F.round(F.col("value") * 100).cast("long")
    y = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", yc.alias("yc")
    )
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "purchase"
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = y.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(is_b, 1)).alias("n_b"),
        F.sum(F.when(is_a, dec(F.col("yc")))).cast("double").alias("s1a"),
        F.sum(F.when(is_a, dec(F.col("yc") * F.col("yc")))).cast("double").alias("s2a"),
        F.sum(F.when(is_b, dec(F.col("yc")))).cast("double").alias("s1b"),
        F.sum(F.when(is_b, dec(F.col("yc") * F.col("yc")))).cast("double").alias("s2b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s1a, s2a, s1b, s2b = (F.col(c) for c in ("s1a", "s2a", "s1b", "s2b"))
    # try_divide on the degenerate-denominator divisions: a one-row arm
    # (n-1 = 0) or two constant arms (sqrt(0) / 0-df) is an ANSI
    # DIVIDE_BY_ZERO job-kill under Spark 4's default, where DuckDB's
    # x/0 yields NULL and the oracle emits a NULL-stat row. Identical
    # doubles on every non-degenerate input, so the hash is unchanged.
    se_a = F.try_divide((s2a - s1a * s1a / n_a), (n_a - 1)) / n_a  # var_a/n_a, cents²
    se_b = F.try_divide((s2b - s1b * s1b / n_b), (n_b - 1)) / n_b
    t = F.try_divide(s1a / n_a - s1b / n_b, F.sqrt(se_a + se_b))
    df = F.try_divide(
        F.pow(se_a + se_b, 2),
        F.try_divide(F.pow(se_a, 2), n_a - 1) + F.try_divide(F.pow(se_b, 2), n_b - 1),
    )
    return m.select(
        "n_a",
        "n_b",
        F.round(s1a / n_a / 100, 6).alias("mean_a"),
        F.round(s1b / n_b / 100, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 3).alias("welch_df"),
    )


@register(
    "window_rolling_median",
    doc="Exact rolling median over the trailing 5 events per user (SURVEY "
    "§3 W3 order-statistics frame): Spark has no exact median window, so "
    "the frame materializes as a bounded collect_list (≤5 doubles), "
    "array_sort, and middle-element pick — still JVM-side, one shuffle, "
    "one sort; even-sized frames average the two middles to match the "
    "continuous-median interpolation DuckDB's median() window uses. The "
    "frame bound keeps per-row state O(k), so the same plan holds at any "
    "scale.",
    tags=("window", "analytics"),
    oracle="""
SELECT user_id, event_id,
       round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
         AS rolling_median_5
FROM events
ORDER BY user_id, event_id
""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    a = F.array_sort(F.collect_list("value").over(w))
    n = F.size(a)
    # collect_list skips NULLs: a frame of only-NULL values yields an
    # EMPTY array, and element_at(a, 0) is an ANSI job-kill
    # (INVALID_INDEX_OF_ZERO) where the oracle's median returns NULL —
    # guard the degenerate frame to NULL explicitly.
    med = F.when(n == 0, F.lit(None).cast("double")).when(
        n % 2 == 1, F.element_at(a, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (F.element_at(a, (n / 2).cast("int")) + F.element_at(a, (n / 2 + 1).cast("int"))) / 2
    )
    return e.select(
        "user_id", "event_id", F.round(med, 6).alias("rolling_median_5")
    ).orderBy("user_id", "event_id")


@register(
    "agg_equidepth_histogram",
    doc="Equi-depth (quartile) histogram per event_type (SURVEY §3 A3 "
    "companion — the optimizer-statistics shape ANALYZE builds): ntile(4) "
    "over a total order (value, event_id tie-break makes tile assignment "
    "deterministic cross-engine), then per-tile count and value bounds. "
    "Raw doubles are only min/max'd, never summed — exact parity without "
    "rounding. One shuffle + sort per event_type partition.",
    tags=("agg", "window", "analytics"),
    oracle="""
WITH t AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS tile
  FROM events)
SELECT event_type, CAST(tile AS INTEGER) AS tile,
       CAST(count(*) AS BIGINT) AS n, min(value) AS lo, max(value) AS hi
FROM t GROUP BY event_type, tile
ORDER BY event_type, tile
""",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    t = e.select("event_type", "value", F.ntile(4).over(w).alias("tile"))
    return (
        t.groupBy("event_type", "tile")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"), F.max("value").alias("hi"))
        .select("event_type", F.col("tile").cast("int").alias("tile"), "n", "lo", "hi")
        .orderBy("event_type", "tile")
    )


@register(
    "range_join_banded_global",
    doc="KEYLESS interval join via time banding (SURVEY §3 J7 scale "
    "variant, operators/joins.py banded_range_join): for every purchase, "
    "count ALL clicks platform-wide in the preceding 5 minutes — no "
    "shared key, so the naive plan is the BroadcastNestedLoopJoin the "
    "plan gate forbids; banding by the window span restores a shuffled "
    "equi join on the band integer (each right row owns one band, each "
    "left window overlaps ≤2 — every pair meets exactly once). The "
    "batch twin of Structured Streaming's interval-join state bucketing. "
    "Bench-suite member: 10 M events × 10 M events, 1.9 M result pairs — "
    "measured at parity with DuckDB's native IEJoin (2.89 s vs 2.83 s).",
    tags=("events", "range-join", "banded"),
    bench=True,
    oracle="""
SELECT p.event_id AS pid,
       CAST(count(*) AS BIGINT) AS n_clicks_5m,
       round(sum(c.value), 2) AS clicks_value
FROM (SELECT event_id, ts, value FROM events WHERE event_type = 'purchase') p
JOIN (SELECT ts, value FROM events WHERE event_type = 'click') c
  ON c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
GROUP BY p.event_id
ORDER BY pid
""",
)
def range_join_banded_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transilien_api_etl_spark.operators.joins import banded_range_join

    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("cts"), F.col("value").alias("cval")
    )
    j = banded_range_join(p, c, "pts", "cts", -300, 0)
    return (
        j.groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_clicks_5m"),
            F.round(F.sum("cval"), 2).alias("clicks_value"),
        )
        .orderBy("pid")
    )


@register(
    "range_agg_prefix_sum",
    doc="Density-robust AGGREGATE twin of range_join_banded_global "
    "(SURVEY §3 J7 scale escape-hatch, operators/joins.py "
    "interval_agg_prefix_sum): the same per-purchase 5-minute click "
    "count/sum, but via boundary probes + distributed prefix sums — "
    "Θ((L+R) log) regardless of match density, where the "
    "pair-materializing banded join (and DuckDB's IEJoin, which this "
    "oracle plans) is Θ(matches) and grew 2.83× at 2× data density. "
    "Click values ride as exact cent integers so the out-of-order "
    "partial sums are drift-free and the answer is hash-equal to the "
    "banded plan's. Registered per VERDICT r5 task 5: the rewrite a "
    "100 TB deployment runs when it needs the window aggregate, not "
    "the pairs.",
    tags=("events", "range-join", "prefix-sum"),
    bench=True,
    oracle="""
SELECT p.event_id AS pid,
       CAST(count(*) AS BIGINT) AS n_clicks_5m,
       round(sum(c.value), 2) AS clicks_value
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT ts, value FROM events WHERE event_type = 'click') c
  ON c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
GROUP BY p.event_id
ORDER BY pid
""",
)
def range_agg_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transilien_api_etl_spark.operators.joins import interval_agg_prefix_sum

    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("cts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = interval_agg_prefix_sum(p, c, "pts", "cts", -300, 0, ["cents"], ["pid"])
    return agg.select(
        "pid",
        F.col("n_matches").alias("n_clicks_5m"),
        F.round(F.col("sum_cents") / 100.0, 2).alias("clicks_value"),
    ).orderBy("pid")


@register(
    "events_anomaly_zscore",
    doc="Rolling z-score anomaly detection (SURVEY §3 W3 application — the "
    "reference flags delay spikes per line the same way): each event "
    "scored against the trailing-20 window's mean/stddev, computed from "
    "exact cent-integer Σ and Σ² in DECIMAL(38,0) window frames (order-"
    "independent, so cross-engine hash-exact); |z| > 3 flags. One "
    "shuffle, one sorted frame; O(1) per-row state at any scale.",
    tags=("events", "analytics", "window", "anomaly"),
    oracle="""
WITH w AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS yc,
         count(*) OVER fr AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER fr AS DOUBLE) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) OVER fr AS DOUBLE) AS s2
  FROM events
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, event_id,
         round((yc - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS zscore
  FROM w WHERE n >= 5 AND s2 * n > s1 * s1)
SELECT user_id, event_id, zscore, abs(zscore) > 3 AS is_anomaly
FROM z ORDER BY user_id, event_id
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    yc = F.round(F.col("value") * 100).cast("long")
    fr = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = e.select(
        "user_id",
        "event_id",
        yc.alias("yc"),
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum(dec(yc)).over(fr).cast("double").alias("s1"),
        F.sum(dec(yc * yc)).over(fr).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    z = (
        w.filter((n >= 5) & (s2 * n > s1 * s1))
        .select(
            "user_id",
            "event_id",
            F.round(
                (F.col("yc") - s1 / n) / F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6
            ).alias("zscore"),
        )
    )
    return z.select(
        "user_id", "event_id", "zscore", (F.abs(F.col("zscore")) > 3).alias("is_anomaly")
    ).orderBy("user_id", "event_id")


@register(
    "orders_pareto_abc",
    doc="Pareto/ABC classification of customers by revenue (SURVEY §3 W4 "
    "application — the 80/95 cumulative-share cut every ops dashboard "
    "runs): rank customers by exact-cent revenue (DECIMAL sums, "
    "deterministic), take the running share of the grand total over the "
    "(revenue desc, custkey) order, class A ≤ 80%, B ≤ 95%, C the tail; "
    "roll up per class. Two shuffles (customer rollup + one global "
    "ordered window): the window runs on customer-cardinality rows, not "
    "orders, and the grand total rides the same window frame — no "
    "scalar-subquery rescan.",
    tags=("orders", "analytics", "pareto", "window"),
    oracle="""
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY o_custkey),
s AS (
  SELECT o_custkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS running,
         sum(cents) OVER () AS total
  FROM r),
c AS (
  SELECT CASE WHEN CAST(running AS DOUBLE) / CAST(total AS DOUBLE) <= 0.80 THEN 'A'
              WHEN CAST(running AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         cents FROM s)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS revenue,
       round(CAST(sum(cents) AS DOUBLE) / CAST(max(t.total) AS DOUBLE), 6) AS share
FROM c, (SELECT sum(cents) AS total FROM r) t
GROUP BY abc_class ORDER BY abc_class
""",
)
def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    r = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    w_run = (
        Window.orderBy(F.desc("cents"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    s = r.select(
        "cents",
        F.sum("cents").over(w_run).alias("running"),
        F.sum("cents").over(w_all).alias("total"),
    )
    frac = F.col("running").cast("double") / F.col("total").cast("double")
    c = s.select(
        F.when(frac <= 0.80, "A").when(frac <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "cents",
        "total",
    )
    return (
        c.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("revenue"),
            F.round(
                F.sum("cents").cast("double") / F.max("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("abc_class")
    )


@register(
    "events_activity_streaks",
    doc="Gaps-and-islands (SURVEY §3 W2/W4 composite — the classic "
    "consecutive-run pattern): a user's distinct active days minus a "
    "per-user day ranking collapses each consecutive run to one "
    "constant group key (date - row_number·1day); per user report the "
    "longest streak, its start, and the streak count. One shuffle on "
    "user_id; every window reuses the same sort — no self-joins, no "
    "recursion.",
    tags=("events", "analytics", "streaks", "window"),
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
g AS (
  SELECT user_id, day,
         day - INTERVAL 1 DAY * row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM d),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len, min(day) AS streak_start
  FROM g GROUP BY user_id, grp),
r AS (
  SELECT user_id, streak_len, streak_start,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, streak_start) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks
  FROM s)
SELECT user_id, streak_len AS longest_streak, streak_start, n_streaks
FROM r WHERE rn = 1 ORDER BY user_id
""",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    d = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp",
        F.col("day") - F.row_number().over(w) * F.expr("INTERVAL 1 DAY"),
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day").alias("streak_start")
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.col("streak_start")
    )
    r = s.select(
        "user_id",
        "streak_len",
        "streak_start",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_streaks"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak"),
            "streak_start",
            "n_streaks",
        )
        .orderBy("user_id")
    )


@register(
    "orders_mom_growth",
    doc="Period-over-period reporting (SURVEY §3 W2 application): monthly "
    "revenue per order priority with month-over-month delta and growth "
    "pct via lag over the finished aggregate — the window runs on "
    "month×priority rows, never on the fact table. Exact-cent sums "
    "(DECIMAL) make the deltas sum-order independent; growth pct rounds "
    "at presentation.",
    tags=("orders", "analytics", "window-lag", "reporting"),
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
         sum(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY 1, 2),
l AS (
  SELECT month, o_orderpriority,
         round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
         lag(cents) OVER (PARTITION BY o_orderpriority ORDER BY month) AS prev
  FROM m)
SELECT month, o_orderpriority, revenue,
       round(CAST(cents_delta AS DOUBLE) / 100, 2) AS delta,
       round(CAST(cents_delta AS DOUBLE) / CAST(prev AS DOUBLE) * 100, 4)
         AS growth_pct
FROM (SELECT *, CAST(round(revenue * 100) AS DECIMAL(38,0)) - prev AS cents_delta
      FROM l) t
WHERE prev IS NOT NULL
ORDER BY month, o_orderpriority
""",
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"), "o_orderpriority"
    ).agg(F.sum(cents).alias("cents"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    l = m.select(
        "month",
        "o_orderpriority",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.lag("cents").over(w).alias("prev"),
    )
    delta_cents = F.round(F.col("revenue") * 100).cast("decimal(38,0)") - F.col("prev")
    return (
        l.filter(F.col("prev").isNotNull())
        .select(
            "month",
            "o_orderpriority",
            "revenue",
            F.round(delta_cents.cast("double") / 100, 2).alias("delta"),
            F.round(
                delta_cents.cast("double") / F.col("prev").cast("double") * 100, 4
            ).alias("growth_pct"),
        )
        .orderBy("month", "o_orderpriority")
    )


@register(
    "events_rfm_segments",
    doc="RFM segmentation (SURVEY §3 W1/A1 composite — the classic "
    "recency/frequency/monetary customer scoring): per user, days since "
    "last purchase (vs the global max ts), purchase count, and exact-"
    "cent spend; each dimension scored into terciles by ntile over a "
    "tie-broken total order (user_id — deterministic cross-engine), "
    "segment = concatenated R·F·M scores, rolled up per segment. The "
    "global anchor is a 1-row broadcast; scoring windows run on "
    "user-cardinality rows.",
    tags=("events", "analytics", "rfm", "window"),
    oracle="""
WITH anchor AS (SELECT max(ts) AS maxts FROM events),
u AS (
  SELECT user_id,
         CAST(date_diff('day', max(ts), (SELECT maxts FROM anchor)) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
sc AS (
  SELECT user_id, recency_days, frequency, cents,
         ntile(3) OVER (ORDER BY recency_days, user_id) AS r_score,
         ntile(3) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         ntile(3) OVER (ORDER BY cents DESC, user_id) AS m_score
  FROM u)
SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR)
         AS segment,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS monetary,
       CAST(min(recency_days) AS BIGINT) AS best_recency_days
FROM sc GROUP BY segment ORDER BY segment
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("maxts"))
    u = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("maxts"), F.col("last_ts")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "cents",
        )
    )
    sc = u.select(
        "user_id",
        "recency_days",
        "frequency",
        "cents",
        F.ntile(3).over(Window.orderBy("recency_days", "user_id")).alias("r_score"),
        F.ntile(3)
        .over(Window.orderBy(F.desc("frequency"), "user_id"))
        .alias("f_score"),
        F.ntile(3).over(Window.orderBy(F.desc("cents"), "user_id")).alias("m_score"),
    )
    return (
        sc.groupBy(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("monetary"),
            F.min("recency_days").cast("long").alias("best_recency_days"),
        )
        .orderBy("segment")
    )


@register(
    "orders_gini_revenue",
    doc="Gini coefficient of customer revenue concentration (SURVEY §3 "
    "A1/W4 statistics application — the inequality complement of "
    "orders_pareto_abc): G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues "
    "sorted ascending with customer-id tie-break. Every accumulator is "
    "an exact cent/rank integer in DECIMAL (i·xᵢ ≤ n·maxcents ≪ 10³⁸), "
    "so the statistic is sum-order independent; only the final ratio "
    "runs in double. One customer rollup + one ordered window on "
    "customer-cardinality rows.",
    tags=("orders", "analytics", "stats", "gini"),
    oracle="""
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
  FROM orders GROUP BY o_custkey),
s AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i
  FROM r),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS DOUBLE) AS total,
         CAST(sum(i * cents) AS DOUBLE) AS weighted
  FROM s)
SELECT n, round(total / 100, 2) AS total_revenue,
       round(2 * weighted / (n * total) - (n + 1.0) / n, 6) AS gini
FROM m
""",
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    r = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    s = r.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("i"),
    )
    m = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("double").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("double").alias("weighted"),
    )
    n, total, weighted = F.col("n"), F.col("total"), F.col("weighted")
    return m.select(
        "n",
        F.round(total / 100, 2).alias("total_revenue"),
        F.round(2 * weighted / (n * total) - (n + 1.0) / n, 6).alias("gini"),
    )


@register(
    "events_autocorr_lag1",
    doc="Lag-1 autocorrelation of each user's value sequence (SURVEY §3 "
    "W2/A1 — the time-series memory statistic): r₁ = Σ(xₜ−x̄)(xₜ₊₁−x̄) "
    "/ Σ(xₜ−x̄)², expanded so every Σ (n, Σx, Σx², Σ xₜ·xₜ₊₁ and the "
    "boundary terms x₁, xₙ) accumulates as exact cent integers in "
    "DECIMAL — sum-order independent — with only the final formula in "
    "double. One shuffle on user_id; the lag product rides the same "
    "sorted window.",
    tags=("events", "analytics", "stats", "autocorr"),
    oracle="""
WITH x AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS xc,
         lead(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS xn,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
m AS (
  SELECT user_id, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) AS s2,
         CAST(sum(CAST(xc * xn AS DECIMAL(38,0))) AS DOUBLE) AS scross,
         CAST(sum(CASE WHEN i = 1 THEN CAST(xc AS DECIMAL(38,0)) END) AS DOUBLE)
           AS first_x,
         CAST(sum(CASE WHEN i = n THEN CAST(xc AS DECIMAL(38,0)) END) AS DOUBLE)
           AS last_x
  FROM x GROUP BY user_id),
r AS (
  SELECT user_id, n,
         round((scross - (s1 / n) * (2 * s1 - first_x - last_x)
                + (n - 1) * (s1 / n) * (s1 / n))
               / (s2 - s1 * s1 / n), 6) AS r1
  FROM m WHERE n >= 10 AND s2 * n > s1 * s1)
SELECT user_id, n, r1 FROM r ORDER BY user_id
""",
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    xc = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    x = e.select(
        "user_id",
        xc.alias("xc"),
        F.lead(xc).over(w).alias("xn"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = x.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(dec(F.col("xc"))).cast("double").alias("s1"),
        F.sum(dec(F.col("xc") * F.col("xc"))).cast("double").alias("s2"),
        F.sum(dec(F.col("xc") * F.col("xn"))).cast("double").alias("scross"),
        F.sum(F.when(F.col("i") == 1, dec(F.col("xc")))).cast("double").alias("first_x"),
        F.sum(F.when(F.col("i") == F.col("n"), dec(F.col("xc"))))
        .cast("double")
        .alias("last_x"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mu = s1 / n
    num = F.col("scross") - mu * (2 * s1 - F.col("first_x") - F.col("last_x")) + (
        n - 1
    ) * mu * mu
    den = s2 - s1 * s1 / n
    return (
        m.filter((n >= 10) & (s2 * n > s1 * s1))
        .select("user_id", "n", F.round(num / den, 6).alias("r1"))
        .orderBy("user_id")
    )


@register(
    "events_changepoint_binary",
    doc="Binary change-point detection per user (SURVEY §3 W4 — the "
    "offline CUSUM/binary-segmentation first step): for every split "
    "position k, score = |mean(x₁..k) − mean(xₖ₊₁..n)|·√(k(n−k)/n); "
    "the prefix sums Sₖ are exact cent integers via a running DECIMAL "
    "window, so every score is a deterministic double and the argmax "
    "(score desc, k asc) is engine-stable. One shuffle + one sorted "
    "window; scores ride the prefix rows, no per-split rescan.",
    tags=("events", "analytics", "changepoint", "window"),
    oracle="""
WITH x AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS xc,
         row_number() OVER w AS k, count(*) OVER (PARTITION BY user_id) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS sk,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
              (PARTITION BY user_id) AS DOUBLE) AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sc AS (
  SELECT user_id, k, n,
         round(abs(sk / k - (st - sk) / (n - k))
               * sqrt(CAST(k AS DOUBLE) * (n - k) / n) / 100, 6) AS score
  FROM x WHERE k < n AND n >= 20),
best AS (
  SELECT user_id, k AS split_k, CAST(n AS BIGINT) AS n, score,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY score DESC, k) AS rn
  FROM sc)
SELECT user_id, CAST(split_k AS BIGINT) AS split_k, n, score
FROM best WHERE rn = 1 ORDER BY user_id
""",
)
def events_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    xc = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("user_id")
    x = e.select(
        "user_id",
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum(xc.cast("decimal(38,0)")).over(wrun).cast("double").alias("sk"),
        F.sum(xc.cast("decimal(38,0)")).over(wp).cast("double").alias("st"),
    )
    k, n, sk, st = F.col("k"), F.col("n"), F.col("sk"), F.col("st")
    score = F.round(
        F.abs(sk / k - (st - sk) / (n - k))
        * F.sqrt(k.cast("double") * (n - k) / n)
        / 100,
        6,
    )
    sc = x.filter((k < n) & (n >= 20)).select(
        "user_id", "k", "n", score.alias("score")
    )
    best = sc.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("score"), "k")
        ),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("k").cast("long").alias("split_k"),
            F.col("n").cast("long").alias("n"),
            "score",
        )
        .orderBy("user_id")
    )


@register(
    "orders_basket_lift",
    doc="Market-basket association rules over order line items (SURVEY §3 "
    "F10-adjacent — frequent-itemset mining): distinct parts per order "
    "form baskets; pair support comes from the oriented (a<b) self-join "
    "on the order key — fan-out bounded by Σ basket_size², the SemDeDup "
    "argument, never corpus²; lift = P(ab)/(P(a)P(b)) from exact counts "
    "with broadcast item-support joins. Top-15 pairs by lift (support "
    "floor 2 — the part space is wide relative to basket size, so a "
    "repeated pair is already signal), deterministic tie-break.",
    tags=("orders", "analytics", "basket", "association"),
    oracle="""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nord AS (SELECT count(DISTINCT l_orderkey) AS n FROM b),
item AS (
  SELECT l_partkey, count(*) AS c FROM b GROUP BY l_partkey),
pair AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS cab
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
   AND y.l_partkey > x.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT pair.pa, pair.pb, CAST(pair.cab AS BIGINT) AS pair_count,
       round(pair.cab * CAST(nord.n AS DOUBLE) / (ia.c * CAST(ib.c AS DOUBLE)), 6)
         AS lift
FROM pair JOIN item ia ON pair.pa = ia.l_partkey
          JOIN item ib ON pair.pb = ib.l_partkey, nord
ORDER BY lift DESC, pa, pb LIMIT 15
""",
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    b = l.select("l_orderkey", "l_partkey").distinct()
    nord = b.agg(F.countDistinct("l_orderkey").alias("n"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    x, y = b.alias("x"), b.alias("y")
    pair = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("y.l_partkey") > F.col("x.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("pa"), F.col("y.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    lift = F.round(
        F.col("cab") * F.col("n").cast("double") / (F.col("ca") * F.col("cb").cast("double")),
        6,
    )
    return (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(nord))
        .select("pa", "pb", F.col("cab").alias("pair_count"), lift.alias("lift"))
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(15)
    )


@register(
    "events_kaplan_meier",
    doc="Kaplan–Meier survival estimator over SESSION durations (SURVEY §3 "
    "W4/A1 — duration analysis the way survival statistics does it): "
    "sessions come from the standard 30-min-gap sessionizer; a session "
    "ending within 30 min of the corpus end is right-CENSORED (it was "
    "still alive when observation stopped — it counts in the at-risk "
    "set but not as a completion event). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ), "
    "computed as exp of a RUNNING sum of logs over the ordered duration "
    "table — the running frame evaluates sequentially in sort order on "
    "both engines, so the float fold is deterministic; counts are exact "
    "integers. Windows run on distinct-duration rows, not events.",
    tags=("events", "analytics", "survival", "window"),
    oracle="""
WITH anchor AS (SELECT max(ts) AS maxts FROM events),
g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid, ts
  FROM g),
u AS (
  SELECT CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS BIGINT)
           AS duration_min,
         max(ts) < (SELECT maxts FROM anchor) - INTERVAL 30 MINUTE AS completed
  FROM sess GROUP BY user_id, sid),
t AS (
  SELECT duration_min,
         CAST(count(*) FILTER (WHERE completed) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS leaving
  FROM u GROUP BY duration_min),
r AS (
  SELECT duration_min, d,
         CAST(sum(leaving) OVER (ORDER BY duration_min DESC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
  FROM t),
s AS (
  SELECT duration_min, d, n_risk,
         round(exp(sum(ln(1 - CAST(d AS DOUBLE) / n_risk))
                   OVER (ORDER BY duration_min ROWS UNBOUNDED PRECEDING)), 6)
           AS survival
  FROM r WHERE d > 0 AND n_risk > d)
SELECT duration_min, d AS n_completed, n_risk, survival
FROM s ORDER BY duration_min
""",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transilien_api_etl_spark.operators.sessionize import sessionize

    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("maxts"))
    sess = sessionize(e, "user_id", "ts", gap_seconds=1800, order_cols=["event_id"])
    u = (
        sess.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .crossJoin(F.broadcast(anchor))
        .select(
            ((F.unix_micros("end_ts") - F.unix_micros("start_ts")) / 60000000)
            .cast("long")
            .alias("duration_min"),
            (F.col("end_ts") < F.col("maxts") - F.expr("INTERVAL 30 MINUTES")).alias(
                "completed"
            ),
        )
    )
    t = u.groupBy("duration_min").agg(
        F.count(F.when(F.col("completed"), 1)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w_desc = Window.orderBy(F.desc("duration_min")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = t.select(
        "duration_min", "d", F.sum("leaving").over(w_desc).cast("long").alias("n_risk")
    )
    w_asc = Window.orderBy("duration_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = F.round(
        F.exp(
            F.sum(F.log(1 - F.col("d").cast("double") / F.col("n_risk"))).over(w_asc)
        ),
        6,
    )
    return (
        r.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
        .select(
            "duration_min",
            F.col("d").alias("n_completed"),
            "n_risk",
            surv.alias("survival"),
        )
        .orderBy("duration_min")
    )
