"""Scalar-function plans — SURVEY.md §3.8 F1-F7 (M3).

Each query exercises one function family end-to-end against the oracle:
datetime (incl. day-of-service and GTFS >24h clocks), strings, JSON, math,
conditionals. All built-ins — every expression stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transilien_api_etl_spark.functions.datetime_fns import (
    day_of_service,
    gtfs_clock_seconds,
    service_departure_ts,
)
from transilien_api_etl_spark.functions.strings import (
    drop_checksum_digit,
    normalize_station_id,
    numeric_id,
)
from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "fn_day_of_service",
    doc="Day-of-service cutoff (SURVEY §3 F1 — after-midnight passages belong "
    "to the previous operating day): yyyyMMdd bucketing with a 03:00 cutoff.",
    tags=("functions", "datetime"),
    oracle="""
SELECT strftime(ts - INTERVAL 3 HOUR, '%Y%m%d') AS day_of_service,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1 ORDER BY 1
""",
)
def fn_day_of_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(day_of_service(F.col("ts"), 3).alias("day_of_service"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("day_of_service")
    )


@register(
    "fn_gtfs_clock",
    doc="GTFS >24:00:00 clock times (SURVEY §3 F1): synthesize an "
    "'HH:MM:SS' clock (hours 20..28) per order, parse it to "
    "seconds-past-service-midnight, and materialize the absolute departure "
    "timestamp via exact epoch-µs arithmetic. 25:10:00 == next-day 01:10.",
    tags=("functions", "datetime"),
    oracle="""
WITH g AS (
  SELECT o_orderkey, o_orderdate,
         lpad(CAST(20 + o_orderkey % 9 AS VARCHAR), 2, '0') || ':' ||
         lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') || ':30' AS clock
  FROM orders
), p AS (
  SELECT o_orderkey, o_orderdate, clock,
         CAST(string_split(clock, ':')[1] AS BIGINT) * 3600 +
         CAST(string_split(clock, ':')[2] AS BIGINT) * 60 +
         CAST(string_split(clock, ':')[3] AS BIGINT)            AS secs
  FROM g
)
SELECT o_orderkey, clock, secs,
       make_timestamp(epoch_us(o_orderdate) + secs * 1000000) AS departure_ts
FROM p ORDER BY o_orderkey
""",
)
def fn_gtfs_clock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    clock = F.concat_ws(
        ":",
        F.lpad((F.lit(20) + F.col("o_orderkey") % 9).cast("string"), 2, "0"),
        F.lpad((F.col("o_orderkey") % 60).cast("string"), 2, "0"),
        F.lit("30"),
    )
    with_clock = o.select("o_orderkey", "o_orderdate", clock.alias("clock"))
    return (
        with_clock.select(
            "o_orderkey",
            "clock",
            gtfs_clock_seconds(F.col("clock")).alias("secs"),
            service_departure_ts(F.col("o_orderdate"), F.col("clock")).alias("departure_ts"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_datetime_parts",
    doc="Calendar decomposition + truncation (SURVEY §3 F1): year/month "
    "rollup of order totals.",
    tags=("functions", "datetime"),
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def fn_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("yr", "mo")
    )


@register(
    "fn_strings_normalize",
    doc="Station-id / train-num normalization (SURVEY §3 F2): digit-run "
    "extraction, zero-pad to UIC width, checksum-digit drop, case + "
    "substring ops.",
    tags=("functions", "strings"),
    oracle="""
WITH s AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CASE WHEN length(CAST(c_custkey AS VARCHAR)) >= 8
              THEN CAST(c_custkey AS VARCHAR)
              ELSE lpad(CAST(c_custkey AS VARCHAR), 8, '0') END AS id8
  FROM customer)
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1)            AS id_str,
       TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS id_num,
       id8                                              AS station_id8,
       substring(id8, 1, 7)                             AS station_id7,
       upper(substring(c_mktsegment, 1, 3))             AS seg3,
       CAST(length(c_name) AS INTEGER)                  AS name_len
FROM s ORDER BY c_custkey
""",
)
def fn_strings_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    c = load_table(spark, sf_dir, "customer")
    id8 = normalize_station_id(F.col("c_custkey"), 8)
    return (
        c.select(
            "c_custkey",
            F.regexp_extract("c_name", "([0-9]+)", 1).alias("id_str"),
            numeric_id(F.col("c_name")).alias("id_num"),
            id8.alias("station_id8"),
            drop_checksum_digit(id8).alias("station_id7"),
            F.upper(F.substring("c_mktsegment", 1, 3)).alias("seg3"),
            F.length("c_name").cast("int").alias("name_len"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_json_props",
    doc="JSON extraction with a declared schema (SURVEY §3 F4): "
    "from_json(props, 'k INT') — typed parse, not string poking; avg(k) per "
    "event type.",
    tags=("functions", "json"),
    oracle="""
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def fn_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_math_projection",
    doc="Math scalar surface (SURVEY §3 F3): per-row net price, floor/ceil, "
    "abs. net_price rounds to 4 decimals — the product of 2-decimal inputs "
    "is exact there, so engine round-half modes can't disagree (they do at "
    "2 decimals whenever the 3rd decimal is exactly 5).",
    tags=("functions", "math"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price,
       CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
       CAST(ceil(l_quantity)  AS BIGINT)            AS qty_ceil,
       round(abs(l_discount - 0.05), 4)             AS disc_dev
FROM lineitem
WHERE l_orderkey <= 2000
ORDER BY l_orderkey, l_linenumber
""",
)
def fn_math_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "fn_case_when",
    doc="Conditional decoding (SURVEY §3 F7 — the reference's "
    "'Retardé'/'Supprimé' status enum): nested CASE bands over type and "
    "value.",
    tags=("functions", "conditional"),
    oracle="""
SELECT CASE WHEN event_type = 'error' THEN 'ANOMALY'
            WHEN event_type IN ('purchase', 'signup') THEN 'CONVERSION'
            ELSE 'TRAFFIC' END AS status,
       CASE WHEN value >= 250 THEN 'HIGH'
            WHEN value >= 100 THEN 'MID'
            ELSE 'LOW' END AS band,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "error", "ANOMALY")
        .when(F.col("event_type").isin("purchase", "signup"), "CONVERSION")
        .otherwise("TRAFFIC")
    )
    band = (
        F.when(F.col("value") >= 250, "HIGH")
        .when(F.col("value") >= 100, "MID")
        .otherwise("LOW")
    )
    return (
        e.groupBy(status.alias("status"), band.alias("band"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("status", "band")
    )


@register(
    "fn_date_arithmetic",
    doc="Date arithmetic surface (SURVEY §3 F1): add_months, months_between, "
    "last_day, date_add, datediff vs a fixed anchor — all engine-portable "
    "integer/date math.",
    tags=("functions", "datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)  AS plus_3m,
       CAST(last_day(o_orderdate) AS TIMESTAMP)           AS month_end,
       CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP)   AS plus_45d,
       datediff('day', DATE '1995-01-01', o_orderdate)    AS days_since_95,
       round(datediff('day', DATE '1995-01-01', o_orderdate) / 30.4375, 4)
                                                          AS approx_months
FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
""",
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_add(d, 45).cast("timestamp").alias("plus_45d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.round(
            F.datediff(d, F.lit("1995-01-01").cast("date")) / F.lit(30.4375), 4
        ).alias("approx_months"),
    ).orderBy("o_orderkey")


@register(
    "fn_levenshtein_sources",
    doc="Fuzzy string matching (SURVEY §3 F2/F10 — dedup building block): "
    "edit distance between every distinct pair of document source labels.",
    tags=("functions", "strings", "dedup"),
    oracle="""
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(levenshtein(a.source, b.source) AS INT) AS edit_dist
FROM s a JOIN s b ON a.source < b.source
ORDER BY src_a, src_b
""",
)
def fn_levenshtein_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    s = d.select("source").distinct()
    a = s.select(F.col("source").alias("src_a"))
    b = s.select(F.col("source").alias("src_b"))
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.levenshtein("src_a", "src_b").cast("int").alias("edit_dist"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "unpivot_lineitem_measures",
    doc="Unpivot / melt (SURVEY §3 — inverse of pivot): lineitem's four "
    "measure columns to (measure, value) long form via df.unpivot; oracle "
    "is the UNION ALL expansion.",
    tags=("setop", "unpivot"),
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber, measure
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    renamed = l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return (
        renamed.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["qty", "price", "discount", "tax"],
            "measure",
            "val",
        )
        .withColumn("val", F.round("val", 2))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@register(
    "fn_listagg_ordered",
    doc="Ordered string aggregation (Spark 4.1 listagg WITHIN GROUP — the "
    "SQL-standard spelling of A5's ordered nesting): top-balance customer "
    "names per nation, deterministically ordered inside the aggregate. "
    "DuckDB twin is string_agg(... ORDER BY ...).",
    tags=("functions", "agg", "strings"),
    oracle="""
SELECT n_name,
       string_agg(c_name, '|' ORDER BY c_acctbal DESC, c_name) AS names,
       CAST(count(*) AS BIGINT) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9000
GROUP BY n_name ORDER BY n_name
""",
)
def fn_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_la_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_la_nation")
    return spark.sql(
        """
        SELECT n_name,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_acctbal DESC, c_name)
                 AS names,
               count(*) AS n
        FROM _la_customer JOIN _la_nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_name ORDER BY n_name
        """
    )


@register(
    "fn_try_arithmetic",
    doc="Error-safe arithmetic (Spark 4 try_divide/try_add/try_multiply — "
    "F7 hardened: a malformed row yields NULL instead of killing a 100 TB "
    "job under ANSI mode): division by a zero-able denominator plus "
    "overflow-prone bigint math, nulls counted per status. Oracle spells "
    "the same semantics with NULLIF/CASE.",
    tags=("functions", "conditional", "nulls"),
    oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_div,
       round(sum(coalesce(o_totalprice / NULLIF(o_orderkey % 10, 0), 0)), 2)
         AS sum_safe_div
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    safe_div = F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(safe_div.isNull().cast("int")).cast("long").alias("n_null_div"),
            F.round(F.sum(F.coalesce(safe_div, F.lit(0.0))), 2).alias("sum_safe_div"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "fn_explode_outer_terms",
    doc="Null-preserving explode (F5 edge case explode() silently gets "
    "wrong): each document's rare long tokens (length ≥ 7) exploded with "
    "explode_outer, so documents with NO such token survive as a NULL-term "
    "row instead of vanishing — the outer-unnest semantics every "
    "per-document fan-out report needs. Oracle emulates via unnest of a "
    "[NULL]-substituted empty list.",
    tags=("functions", "arrays", "null"),
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> len(w) >= 7) AS long_toks
  FROM documents),
x AS (
  SELECT doc_id,
         unnest(CASE WHEN len(long_toks) = 0 THEN [NULL] ELSE long_toks END)
           AS term
  FROM t)
SELECT doc_id, term FROM x ORDER BY doc_id, term NULLS FIRST
""",
)
def fn_explode_outer_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.split(F.col("text"), " "), lambda w: F.length(w) >= 7
    )
    return (
        d.select("doc_id", F.explode_outer(long_toks).alias("term"))
        .orderBy("doc_id", F.col("term").asc_nulls_first())
    )


@register(
    "fn_tz_paris_offsets",
    doc="Timezone conversion with REAL DST rules (F1 — the reference's "
    "Paris-local clock handling, done right instead of with a fixed "
    "offset): every order timestamp converted UTC→Europe/Paris, grouped "
    "by the realized UTC offset. Six years of orders cross ~12 DST "
    "transitions (including the pre-1996 EU September rollback), so both "
    "engines must agree on the IANA tzdata, not just on +1. The oracle's "
    "AT TIME ZONE chain is session-timezone-independent, as is Spark's "
    "from_utc_timestamp under the pinned-UTC session.",
    tags=("functions", "datetime", "timezone"),
    oracle="""
WITH x AS (
  SELECT o_orderdate,
         (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Paris' AS paris
  FROM orders)
SELECT CAST((epoch_us(paris) - epoch_us(o_orderdate)) / 3600000000.0 AS INTEGER)
         AS offset_hours,
       count(*) AS n_orders,
       min(o_orderdate) AS first_utc,
       max(o_orderdate) AS last_utc
FROM x GROUP BY 1 ORDER BY offset_hours
""",
)
def fn_tz_paris_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    paris = F.from_utc_timestamp(F.col("o_orderdate"), "Europe/Paris")
    off = (
        (F.unix_micros(paris) - F.unix_micros(F.col("o_orderdate")))
        / 3_600_000_000.0
    ).cast("int")
    return (
        o.select(off.alias("offset_hours"), "o_orderdate")
        .groupBy("offset_hours")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderdate").alias("first_utc"),
            F.max("o_orderdate").alias("last_utc"),
        )
        .orderBy("offset_hours")
    )


@register(
    "fn_array_setops",
    doc="Array set algebra (F5 depth): each user's distinct event types on "
    "even vs odd event ids, combined with array_union / array_intersect / "
    "array_except — the oracle recomputes the three cardinalities "
    "relationally, so the array semantics (dedup, null-free membership) "
    "are value-checked, not just type-checked.",
    tags=("functions", "arrays", "setops"),
    oracle="""
WITH t AS (
  SELECT DISTINCT user_id, event_type, event_id % 2 = 0 AS even
  FROM events WHERE user_id < 40),
pairs AS (
  SELECT user_id, event_type,
         bool_or(even) AS on_even, bool_or(NOT even) AS on_odd
  FROM t GROUP BY user_id, event_type)
SELECT user_id,
       CAST(count(*) AS INTEGER) AS n_union,
       CAST(count(*) FILTER (on_even AND on_odd) AS INTEGER) AS n_both,
       CAST(count(*) FILTER (on_even AND NOT on_odd) AS INTEGER) AS n_even_only
FROM pairs GROUP BY user_id ORDER BY user_id
""",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    halves = e.groupBy("user_id").agg(
        F.array_distinct(
            F.collect_list(F.when(F.col("event_id") % 2 == 0, F.col("event_type")))
        ).alias("ev"),
        F.array_distinct(
            F.collect_list(F.when(F.col("event_id") % 2 != 0, F.col("event_type")))
        ).alias("od"),
    )
    return halves.select(
        "user_id",
        F.size(F.array_union("ev", "od")).alias("n_union"),
        F.size(F.array_intersect("ev", "od")).alias("n_both"),
        F.size(F.array_except("ev", "od")).alias("n_even_only"),
    ).orderBy("user_id")
