"""Extended TPC-H shapes over the reduced test schema (SURVEY §3 J2/A1/F7).

The test tables are a reduced TPC-H (no partsupp, no l_shipmode /
l_commitdate / l_receiptdate, no c_phone / p_container), so every query
here is *adapted*: the join/subquery shape is preserved, the missing
columns are replaced by semantically equivalent ones that exist (lateness
= l_shipdate more than 90 days after o_orderdate; q22's phone country-code
= nation key; the partsupp-based queries use lineitem as the part↔supplier
bridge and avg unit sell price / 60% of retail price as the cost proxy).
Every query keeps the classic plan-shape lesson it exists to teach:

- q2  correlated per-group min subquery (min-cost supplier per part)
- q8  multi-way star + conditional share-of-total aggregation
- q9  multi-dim profit rollup across a 5-way star
- q11 HAVING against a scalar fraction-of-global-total subquery
- q12 fact-fact join + CASE-bucketed counts
- q13 left-join count distribution (group-by of a group-by)
- q14 conditional numerator / total denominator ratio
- q15 aggregate + scalar-max self-restriction (top revenue supplier)
- q16 distinct-count rollup with an exclusion anti-join
- q19 disjunctive conjunct join predicate (OR of brand/size/qty bands)
- q20 nested IN-subquery chain (part subset → shipped-share → suppliers)
- q21 EXISTS + NOT EXISTS over the same derived relation
- q22 scalar avg subquery + NOT EXISTS anti join

Scale posture: tiny dims (nation, region) are broadcast explicitly; the
filtered mid-size sides (part subsets, per-quarter revenue) are left to AQE
to broadcast at runtime if they measure small — an explicit hint would be
wrong at 100 TB where `part` is millions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "q8_market_share",
    doc="TPC-H Q8 shape (J2 multi-way star + conditional agg): NATION_3's "
    "share of ECONOMY-part revenue sold to EUROPE customers, by order year. "
    "Customer side is pre-reduced through broadcast nation⋈region before the "
    "fact⋈fact joins so the shuffled side shrinks first.",
    tags=("join", "agg", "star"),
    oracle="""
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # Reduce customer to the EUROPE subset via broadcast dims BEFORE the
    # fact joins; supplier picks up its nation name the same way.
    eur_cust = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == n.n_nationkey,
    ).select("c_custkey")
    sup_nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("sup_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.select("p_partkey"), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(eur_cust, o.o_custkey == F.col("c_custkey"))
        .join(sup_nat, l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("sup_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q12_late_shipment_priority",
    doc="TPC-H Q12 shape adapted (no l_shipmode/commitdate in schema): "
    "lineitems bucketed by lateness (shipped >90 days after order date), "
    "counting high- vs low-priority orders per bucket. Fact⋈fact join "
    "shuffles on orderkey; CASE buckets aggregate map-side.",
    tags=("join", "agg", "conditional"),
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
            THEN 'late' ELSE 'ontime' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ship_bucket
ORDER BY ship_bucket
""",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(F.datediff("l_shipdate", "o_orderdate") > 90, "late").otherwise("ontime"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q13_customer_order_distribution",
    doc="TPC-H Q13 shape (J3 + group-by of a group-by): distribution of "
    "order counts per customer, customers with zero orders included via the "
    "left join. Two shuffles by construction (custkey, then c_count) — the "
    "second input is at most |distinct counts| rows.",
    tags=("join", "agg", "outer"),
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    doc="TPC-H Q14 shape (conditional-numerator ratio): share of one "
    "month's revenue from PROMO parts. Shipdate filter pushes to the "
    "lineitem scan; part join carries only (p_partkey, p_type).",
    tags=("join", "agg", "conditional"),
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            2,
        ).alias("promo_revenue")
    )


@register(
    "q15_top_supplier",
    doc="TPC-H Q15 shape (aggregate + scalar-max self-restriction): the "
    "supplier(s) with max quarterly revenue. The per-supplier revenue "
    "relation is computed once and reused; its 1-row max side broadcasts.",
    tags=("join", "agg", "subquery"),
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q19_disjunctive_predicates",
    doc="TPC-H Q19 shape adapted (no p_container/l_shipinstruct): revenue "
    "under an OR of three brand/size/quantity bands. The equi key stays a "
    "plain hash join; the disjunction is a post-join filter Catalyst can "
    "partially push (brand/size terms to the part scan, quantity to "
    "lineitem via constraint propagation of the common bounds).",
    tags=("join", "filter", "disjunction"),
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q21_waiting_suppliers",
    doc="TPC-H Q21 shape adapted (lateness = shipped >90 days after order "
    "date, no l_commitdate/receiptdate): suppliers who were the ONLY late "
    "supplier in a finished multi-supplier order — EXISTS plus NOT EXISTS "
    "over the same derived lateness relation; Spark decorrelates both to "
    "semi/anti joins (asserted in tests/test_plan_shapes.py).",
    tags=("join", "subquery", "exists"),
    oracle="""
WITH late_lines AS (
  SELECT l_orderkey, l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) > 90 AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, count(*) AS numwait
FROM late_lines l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM late_lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late_lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q21_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q21_orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_q21_supplier")
    return spark.sql(
        """
        WITH late_lines AS (
          SELECT l_orderkey, l_suppkey,
                 datediff(l_shipdate, o_orderdate) > 90 AS late
          FROM _q21_lineitem JOIN _q21_orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s_name, count(*) AS numwait
        FROM late_lines l1 JOIN _q21_supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM late_lines l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late_lines l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


@register(
    "q22_dormant_customers",
    doc="TPC-H Q22 shape adapted (nation key in place of the absent phone "
    "country code): per-nation count and balance of above-average-balance "
    "customers with no order since 2000 — scalar avg subquery (broadcast "
    "1-row) + NOT EXISTS anti join on the date-filtered orders.",
    tags=("join", "subquery", "anti"),
    oracle="""
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_q22_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q22_orders")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_q22_nation")
    return spark.sql(
        """
        SELECT n_name, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM _q22_customer JOIN _q22_nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM _q22_customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM _q22_orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@register(
    "q2_min_cost_supplier",
    doc="TPC-H Q2 shape adapted (lineitem bridges part↔supplier in place of "
    "partsupp; unit cost = best unit sell price ever offered — min is "
    "summation-order-independent, so the cross-engine hash is exact where "
    "an avg would drift by one ulp): for mid-size parts, the EUROPE "
    "supplier(s) offering the per-part minimum unit cost. The "
    "correlated min subquery becomes a window min over the per-(part, "
    "supplier) aggregate — one extra window pass instead of a second scan + "
    "self-join of the costs relation. Supplier side is pre-reduced through "
    "broadcast nation⋈region; the part subset broadcast-semi-joins the "
    "costs relation before the window so the window input is already small.",
    tags=("join", "subquery", "window"),
    oracle="""
WITH costs AS (
  -- unit_cost stays an unrounded double: min() of identical IEEE divisions
  -- is bit-exact across engines, while round() is not (Spark rounds the
  -- shortest decimal repr HALF_UP; DuckDB rounds the binary value), so
  -- rounding here would DESYNC the hash at half-cent boundaries.
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey)
SELECT p_partkey, p_name, s_name, unit_cost
FROM costs
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size BETWEEN 30 AND 40
  AND unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                   WHERE c2.l_partkey = costs.l_partkey)
ORDER BY p_partkey, s_name
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(30, 40))
    eur_sup = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey", "s_name")
    # Restrict to the part subset BEFORE aggregating: per-part min over a
    # subset equals the subset of per-part mins, and at 100 TB the semi
    # join prunes the lineitem scan down to the broadcast part ids.
    costs = (
        l.join(p.select("p_partkey", "p_name"), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eur_sup), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q9_product_type_profit",
    doc="TPC-H Q9 shape adapted (supply cost proxy = 60% of p_retailprice "
    "per unit, partsupp absent): profit by supplier nation and order year "
    "over gear-named parts. Five-way star: lineitem drives, part filter "
    "broadcast-prunes first, orders joins on orderkey (the only fact⋈fact "
    "shuffle), supplier⋈nation broadcast. Profit = revenue − cost, rolled "
    "up along (nation, year).",
    tags=("join", "agg", "star"),
    oracle="""
SELECT n_name AS sup_nation, year(o_orderdate) AS o_year,
       -- per-row double → DECIMAL, then exact decimal summation: the sum is
       -- identical regardless of accumulation order, unlike a double sum
       -- whose last-ulp drift flips the cent rounding between engines
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.6 * p_retailprice * l_quantity
                           AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY sup_nation, o_year
ORDER BY sup_nation, o_year DESC
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    sup_nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("sup_nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sup_nat), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("sup_nation", F.year("o_orderdate").alias("o_year"))
        # decimal accumulation: order-independent exact sum (see oracle note)
        .agg(
            F.round(F.sum(profit.cast("decimal(25,6)")).cast("double"), 2).alias(
                "sum_profit"
            )
        )
        .orderBy("sup_nation", F.desc("o_year"))
    )


@register(
    "q11_important_part_value",
    doc="TPC-H Q11 shape adapted (value of a part = discounted revenue "
    "through NATION_1 suppliers, lineitem in place of partsupp): parts "
    "whose value exceeds 1/1000 of the total. The global total is a 1-row "
    "aggregate broadcast into the HAVING comparison — the per-part and "
    "global aggregates share one shuffled relation, scanned once via a "
    "cached intermediate.",
    tags=("agg", "subquery", "having"),
    oracle="""
WITH part_value AS (
  SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, value
FROM part_value
WHERE value > (SELECT sum(value) * 0.001 FROM part_value)
ORDER BY value DESC, p_partkey
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    part_value = (
        l.join(F.broadcast(nat_sup), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "value"
            )
        )
    )
    threshold = part_value.agg((F.sum("value") * 0.001).alias("thr"))
    return (
        part_value.join(F.broadcast(threshold), F.col("value") > F.col("thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.desc("value"), "p_partkey")
    )


@register(
    "q16_supplier_part_count",
    doc="TPC-H Q16 shape adapted (supplier exclusion = negative account "
    "balance, lineitem bridges part↔supplier): how many distinct suppliers "
    "ship each (brand, type, size) combination outside one brand, excluding "
    "flagged suppliers via a broadcast anti join BEFORE the distinct-count "
    "shuffle — the exclusion list is tiny, the fact relation is not.",
    tags=("agg", "anti", "distinct"),
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(bad_sup), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p.select("p_partkey", "p_brand", "p_type", "p_size"), l.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_share_suppliers",
    doc="TPC-H Q20 shape adapted (a supplier 'dominates' a part if it "
    "shipped >20% of that part's 1997 quantity; partsupp availability is "
    "absent): names of NATION_2 suppliers dominating any red part. The "
    "nested IN chain (parts → per-(supp, part) share → suppliers) becomes "
    "two aggregations over one scan plus a semi join — the per-part total "
    "reuses the per-(supp, part) partial aggregate, not a second scan.",
    tags=("join", "subquery", "semi"),
    oracle="""
WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM red_parts)
  GROUP BY l_partkey, l_suppkey)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped s1
    WHERE qty > 0.2 * (SELECT sum(qty) FROM shipped s2
                       WHERE s2.l_partkey = s1.l_partkey))
ORDER BY s_name
""",
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    shipped = (
        l.join(F.broadcast(red), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # The correlated per-part total is a window sum over the SAME aggregate
    # — no second scan, no self-join, one extra pass over the shuffled data.
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.2 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
