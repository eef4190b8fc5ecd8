"""Relational coverage extensions — the remaining SURVEY.md §3 rows:
J8 cross join, A4 GROUPING SETS (explicit), A2 approx/exact count-distinct
twin, O1/O2 global sort + limit, U1 union-all, F6 map/struct construction,
X4 UDTF.

Each stays oracle-expressible except where noted (approx HLL counts pair
with the exact twin that IS checked; the approx column is asserted within
relative error, not hashed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "cross_join_region_pairs",
    doc="Cross join (SURVEY §3 J8): ordered region×region pairs — tiny dims "
    "only; CartesianProduct is intentional and bounded here, and exactly the "
    "plan shape to FORBID on fact tables (see tests/test_plan_shapes.py).",
    tags=("join", "cross"),
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
ORDER BY from_region, to_region
""",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_name").alias("to_region"))
    return (
        a.crossJoin(b)
        .filter(F.col("from_region") < F.col("to_region"))
        .orderBy("from_region", "to_region")
    )


@register(
    "agg_grouping_sets",
    doc="Explicit GROUPING SETS (SURVEY §3 A4): order-status totals at "
    "(status, priority), (status), and grand-total granularities in one "
    "pass — the general form rollup/cube specialize.",
    tags=("agg", "grouping-sets"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_approx_distinct_twin",
    doc="HLL approx_count_distinct next to its exact twin (SURVEY §3 A2, "
    "§6.2): the oracle checks the exact column; the approx column is "
    "projected to its signed error vs exact and asserted |err| <= 5% by "
    "bucketing — deterministic for a fixed dataset, hence hashable.",
    tags=("agg", "approx"),
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_exact,
       TRUE AS approx_within_5pct
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_approx_distinct_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return (
        agg.select(
            "o_orderstatus",
            "n_exact",
            (F.abs(F.col("n_approx") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
                "approx_within_5pct"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sort_global_top100",
    doc="Global sort + limit (SURVEY §3 O1/O2): top-100 orders by price. "
    "Physical plan is TakeOrderedAndProject — per-partition heap + driver "
    "merge, never a full range-partitioned sort.",
    tags=("sort", "topk"),
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def sort_global_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "total_price")
    )


@register(
    "union_all_order_events",
    doc="Union-all without dedup (SURVEY §3 U1 — concatenating per-station "
    "poll batches): order-year counts unioned with event-year counts, "
    "unionByName so column order can never silently rotate.",
    tags=("setop", "union"),
    oracle="""
SELECT src, y, n FROM (
  SELECT 'orders' AS src, CAST(year(o_orderdate) AS INT) AS y, count(*) AS n
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'events' AS src, CAST(year(ts) AS INT) AS y, count(*) AS n
  FROM events GROUP BY 2)
ORDER BY src, y
""",
)
def union_all_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    oy = o.groupBy(F.year("o_orderdate").cast("int").alias("y")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("orders").alias("src"), "y", "n")
    ey = e.groupBy(F.year("ts").cast("int").alias("y")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("events").alias("src"), "y", "n")
    return oy.unionByName(ey).orderBy("src", "y")


@register(
    "fn_map_struct_shapes",
    doc="Map/struct construction + field access (SURVEY §3 F6): per-event "
    "typed struct and string map, then field/key projection back out — the "
    "dict-shaped-record round-trip the reference does in Python.",
    tags=("functions", "map-struct"),
    oracle="""
SELECT event_id,
       event_type AS typ,
       printf('%.2f', round(value, 2)) AS val_str,
       year(ts) AS y
FROM events
WHERE event_type IN ('purchase', 'signup')
ORDER BY event_id
""",
)
def fn_map_struct_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    shaped = (
        e.filter(F.col("event_type").isin("purchase", "signup"))
        .withColumn(
            "rec",
            F.struct(
                F.col("event_type").alias("typ"),
                F.year("ts").alias("y"),
            ),
        )
        .withColumn(
            "attrs",
            F.create_map(
                F.lit("val"), F.format_string("%.2f", F.round("value", 2)),
            ),
        )
    )
    # project struct fields / map keys back out
    return shaped.select(
        "event_id",
        F.col("rec.typ").alias("typ"),
        F.col("attrs")["val"].alias("val_str"),
        F.col("rec.y").alias("y"),
    ).orderBy("event_id")


@register(
    "udtf_explode_shingles",
    doc="UDTF surface (SURVEY §3 X4): table function exploding each document "
    "into its 5-gram character shingles with positions. Registered via "
    "F.udtf; oracle is a LATERAL unnest over generate_series.",
    tags=("udf", "udtf", "text"),
    oracle="""
SELECT d.doc_id, gs.pos, substring(d.text, gs.pos + 1, 5) AS shingle
FROM documents d,
     LATERAL (SELECT unnest(generate_series(0, CAST(length(d.text) AS INT) - 5)) AS pos) gs
WHERE length(d.text) >= 5 AND d.doc_id <= 50
ORDER BY doc_id, pos
""",
)
def udtf_explode_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, shingle: string")
    class ShingleUDTF:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None or len(text) < 5:
                return
            for pos in range(len(text) - 4):
                yield pos, text[pos : pos + 5]

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("shingles", ShingleUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.shingle
        FROM _udtf_docs d, LATERAL shingles(d.doc_id, d.text) s
        ORDER BY d.doc_id, s.pos
        """
    )


@register(
    "q4_order_priority_exists",
    doc="EXISTS correlated subquery (SURVEY §4.2.2 SQL entry path + §5 "
    "subquery decorrelation): Catalyst rewrites the EXISTS into a left semi "
    "join — asserted decorrelated in tests/test_plan_shapes.py.",
    tags=("join", "subquery"),
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM _q4_orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM _q4_lineitem WHERE l_orderkey = o_orderkey
                      AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q17_small_quantity_revenue",
    doc="Correlated scalar subquery (SURVEY §5 RewriteCorrelatedScalarSubquery): "
    "revenue from lineitems under 20%% of their part's average quantity — "
    "decorrelates to an aggregate + join, no per-row re-scan.",
    tags=("join", "subquery", "agg"),
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l1
WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l1.l_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q17_lineitem")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM _q17_lineitem l1
        WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM _q17_lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@register(
    "q10_returned_items",
    doc="TPC-H Q10 shape (J2/A1/O2): revenue lost to returned items per "
    "customer in a quarter — fact⋈fact join (orders⋈lineitem) shuffles on "
    "the key, nation dim broadcasts, top-20 via TakeOrderedAndProject.",
    tags=("join", "agg", "topk"),
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(l.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    doc="TPC-H Q18 shape (A1 + IN-subquery semi join): orders whose total "
    "quantity exceeds 250 — the inner aggregate feeds a semi join, so the "
    "big lineitem table is reduced before the orders join.",
    tags=("join", "agg", "subquery"),
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS total_price,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
    )


@register(
    "q7_nation_trade_pairs",
    doc="TPC-H Q7 shape (J2 multi-dim): trade volume between customer-nation "
    "and supplier-nation pairs by year — two independent broadcast dim "
    "chains hanging off one fact⋈fact join; only lineitem⋈orders shuffles.",
    tags=("join", "agg"),
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q7_nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").cast("int").alias("y"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
            .cast("long")
            .alias("volume")
        )
        .orderBy("cust_nation", "supp_nation", "y")
    )


@register(
    "agg_percentile_approx_twin",
    doc="percentile_approx next to the exact percentile (SURVEY §3 A3, "
    "§6.2 approx-twin pattern): the oracle hashes the exact p50/p95 and a "
    "boolean asserting the approx sketch landed within 2% relative error.",
    tags=("agg", "approx"),
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95_exact,
       TRUE AS approx_within_2pct
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def agg_percentile_approx_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_a"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95_a"),
    )
    ok = (F.abs(F.col("p50_a") - F.col("p50")) <= 0.02 * F.col("p50")) & (
        F.abs(F.col("p95_a") - F.col("p95")) <= 0.02 * F.col("p95")
    )
    return agg.select(
        "o_orderpriority",
        F.round("p50", 2).alias("p50_exact"),
        F.round("p95", 2).alias("p95_exact"),
        ok.alias("approx_within_2pct"),
    ).orderBy("o_orderpriority")


_DQ_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "dq_profile_orders",
    doc="Data-quality profile (the pre-training-run expectations check): "
    "per-column null count, distinct count, min and max (stringified) over "
    "orders — computed in ONE scan as a single 24-metric aggregate, then "
    "exploded into a row per column. The naive per-column UNION (the oracle "
    "form) scans the table once per column; at 100 TB the single-pass form "
    "is the only viable one. min/max stringification is cast-stable across "
    "engines for these value ranges (no E-notation below 1e7).",
    tags=("agg", "profile", "pipeline"),
    oracle="""
SELECT 'o_custkey' AS col,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT o_custkey) AS n_distinct,
       CAST(min(o_custkey) AS VARCHAR) AS vmin, CAST(max(o_custkey) AS VARCHAR) AS vmax
FROM orders
UNION ALL
SELECT 'o_orderdate',
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderdate),
       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderkey',
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderkey),
       CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderpriority),
       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderstatus),
       CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_totalprice),
       CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
FROM orders
ORDER BY col
""",
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _DQ_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("vmin"),
                F.col(f"mx_{c}").alias("vmax"),
            )
            for c in _DQ_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*").orderBy("col")


@register(
    "join_full_outer_daily_volume",
    doc="FULL OUTER join (completes the §3.3 outer-join family beyond "
    "J3's left outer): per-day order counts ⋈ per-day event counts — "
    "days with only orders and days with only events both survive with "
    "NULL on the absent side, the day key coalesces across sides. Both "
    "inputs aggregate BEFORE the join (tiny keyed sides), so the full "
    "outer join shuffles day-cardinality rows, not fact rows.",
    tags=("join", "outer"),
    oracle="""
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
  FROM orders GROUP BY 1),
e AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n_events
  FROM events GROUP BY 1)
SELECT coalesce(o.day, e.day) AS day, o.n_orders, e.n_events
FROM o FULL OUTER JOIN e ON o.day = e.day
ORDER BY day
""",
)
def join_full_outer_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        o.alias("o")
        .join(e.alias("e"), F.col("o.day") == F.col("e.day"), "full_outer")
        .select(
            F.coalesce(F.col("o.day"), F.col("e.day")).alias("day"),
            "n_orders",
            "n_events",
        )
        .orderBy("day")
    )


@register(
    "join_null_safe_buckets",
    doc="Null-safe equality join (`<=>` / IS NOT DISTINCT FROM — the "
    "§3.3 completeness case plain equi-joins silently drop): customers "
    "and suppliers bucketed by nationkey%5 with bucket 3 nulled out on "
    "both sides; the NULL buckets MATCH each other under null-safe "
    "equality, so the null×null pair count is part of the checked "
    "result, not a dropped row.",
    tags=("join", "null"),
    oracle="""
WITH c AS (SELECT nullif(c_nationkey % 5, 3) AS k FROM customer),
s AS (SELECT nullif(s_nationkey % 5, 3) AS k FROM supplier)
SELECT c.k AS bucket, count(*) AS n_pairs
FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
GROUP BY c.k
ORDER BY bucket NULLS FIRST
""",
)
def join_null_safe_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(3)).alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(3)).alias("k")
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.k").eqNullSafe(F.col("s.k")))
        .groupBy(F.col("c.k").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("bucket").asc_nulls_first())
    )


@register(
    "agg_percentile_disc",
    doc="DISCRETE percentiles per group (completes A3 beyond the "
    "interpolated quantile_cont twin): the p-quantile is the first actual "
    "data value whose cumulative share reaches p — sort_array(collect_list) "
    "indexed at ceil(p·n). Returns members of the dataset, never "
    "interpolated synthetics, which is what a latency-SLO report wants.",
    tags=("agg", "percentile"),
    oracle="""
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5) AS p50_disc,
       quantile_disc(o_totalprice, 0.9) AS p90_disc,
       count(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")

    def disc(p: float):
        arr = F.sort_array(F.collect_list("o_totalprice"))
        idx = F.ceil(F.size(arr) * F.lit(p)).cast("int")
        return F.element_at(arr, F.greatest(idx, F.lit(1)))

    return (
        o.groupBy("o_orderpriority")
        .agg(
            disc(0.5).alias("p50_disc"),
            disc(0.9).alias("p90_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "fn_map_higher_order",
    doc="Map higher-order surface (F6 depth): per-user event-type counts "
    "built as a MAP (map_from_entries), doubled via transform_values, "
    "error entries dropped via map_filter, exploded back to rows for the "
    "oracle — the map round-trip is internal, the checked result is the "
    "equivalent filtered group-by.",
    tags=("functions", "map"),
    oracle="""
SELECT user_id, event_type, count(*) * 2 AS doubled
FROM events
WHERE user_id < 40 AND event_type <> 'error'
GROUP BY user_id, event_type
ORDER BY user_id, event_type
""",
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    cleaned = F.map_filter(doubled, lambda k, _: k != F.lit("error"))
    return (
        as_map.select("user_id", F.explode(cleaned).alias("event_type", "doubled"))
        .orderBy("user_id", "event_type")
    )


@register(
    "agg_salted_twin",
    doc="Two-phase SALTED aggregation as a driver-checked query (§5 skew "
    "defence, beyond the tests): per-event-type count and exact decimal "
    "sum computed via partial agg on (key, salt-of-16) then final agg on "
    "key — the decomposition a giant hot group needs when even AQE's "
    "partition split can't fit it. Sum rides DECIMAL so the two-phase "
    "re-accumulation is order-independent; oracle is the plain one-phase "
    "group-by.",
    tags=("agg", "skew"),
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def agg_salted_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transilien_api_etl_spark.operators.skew import salted_agg

    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        id_cols=["event_id"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (
                F.sum(F.col("value").cast("decimal(20,2)")),
                F.sum("total"),
            ),
        },
        n_salt=16,
    )
    return out.select(
        "event_type", "n", F.col("total").cast("double").alias("total")
    ).orderBy("event_type")


@register(
    "agg_boolean_family",
    doc="Boolean aggregate family (A-surface completeness): count_if, "
    "bool_and / bool_or, and max_by / min_by (argmax with event_id "
    "tie-break baked into the struct ordering) per event type.",
    tags=("agg", "boolean"),
    oracle="""
SELECT event_type,
       count(*) FILTER (value > 100) AS n_over_100,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 400) AS any_over_400,
       min(CASE WHEN value = m.mx THEN event_id END) AS argmax_event
FROM events e
JOIN (SELECT event_type AS et, max(value) AS mx FROM events GROUP BY 1) m
  ON e.event_type = m.et
GROUP BY event_type ORDER BY event_type
""",
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    mx = e.groupBy(F.col("event_type").alias("et")).agg(F.max("value").alias("mx"))
    return (
        e.join(F.broadcast(mx), e.event_type == mx.et)
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).alias("n_over_100"),
            F.bool_and(F.col("value") > 0).alias("all_positive"),
            F.bool_or(F.col("value") > 400).alias("any_over_400"),
            F.min(
                F.when(F.col("value") == F.col("mx"), F.col("event_id"))
            ).alias("argmax_event"),
        )
        .orderBy("event_type")
    )
