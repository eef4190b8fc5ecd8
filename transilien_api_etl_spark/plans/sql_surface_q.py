"""Modern SQL-surface plans (SURVEY §4.2.2 SQL entry path, Spark 4.x):
VARIANT semi-structured access, correlated LATERAL subqueries, and
recursive CTEs — each stated in SQL (the entry path a reference user's
ad-hoc queries take), each with a DuckDB oracle in the shared dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "fn_variant_props",
    doc="VARIANT semi-structured access (Spark 4 parse_json/variant_get — "
    "the open-schema alternative to F4's declared-schema from_json): "
    "events.props is parsed once to VARIANT, field k extracted typed, "
    "aggregated per event_type. Variant's binary encoding scans ~an order "
    "faster than per-row JSON string parsing at 100 TB.",
    tags=("functions", "json", "variant"),
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def fn_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_var_events")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS sum_k,
               CAST(min(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS min_k,
               CAST(max(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS max_k
        FROM _var_events GROUP BY event_type ORDER BY event_type
        """
    )


@register(
    "sql_lateral_top2_orders",
    doc="Correlated LATERAL subquery with LIMIT (Spark 4 lateral join — "
    "the SQL spelling of per-group top-k): each low-key customer's two "
    "priciest orders. Catalyst decorrelates this to the same window/top-k "
    "physical shape as topk_orders_per_customer — asserted by parity with "
    "the identical DuckDB LATERAL.",
    tags=("join", "lateral", "topk", "sql"),
    oracle="""
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
WHERE c.c_custkey < 100
ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
""",
)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM _lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        WHERE c.c_custkey < 100
        ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
        """
    )


_RECURSIVE_SQL = """
WITH RECURSIVE monthly AS (
  SELECT month(o_orderdate) AS m, round(sum(o_totalprice), 2) AS rev
  FROM {orders}
  WHERE year(o_orderdate) = 1997
  GROUP BY month(o_orderdate)
),
running(m, rev, cum) AS (
  SELECT m, rev, rev FROM monthly WHERE m = 1
  UNION ALL
  SELECT monthly.m, monthly.rev, round(running.cum + monthly.rev, 2)
  FROM running JOIN monthly ON monthly.m = running.m + 1
)
SELECT m, rev, cum FROM running ORDER BY m
"""


@register(
    "sql_recursive_running_total",
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): 1997 monthly revenue with "
    "a running total computed by the recursion itself (no window "
    "function) — the iterative-SQL surface for chain/hierarchy walks. "
    "Identical SQL text runs on DuckDB as the oracle.",
    tags=("sql", "recursive", "agg"),
    oracle=_RECURSIVE_SQL.format(orders="orders"),
)
def sql_recursive_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rec_orders")
    return spark.sql(_RECURSIVE_SQL.format(orders="_rec_orders"))
