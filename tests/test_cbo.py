"""ANALYZE-TABLE-driven cost-based optimization (SURVEY §5: the engine
leans on AQE by default; this demonstrates the CBO path for the cases AQE
cannot fix — join ORDER is fixed before runtime, so a pessimal written
order needs table/column statistics to be re-ordered at plan time).

The demonstration: a three-way join written in the worst order
(fact ⋈ fact first, the selective tiny dim last). With
`spark.sql.cbo.enabled` + `joinReorder.enabled` and ANALYZE'd tables,
Catalyst's `CostBasedJoinReorder` rewrites the join tree; without stats it
cannot. Assertions check (a) the catalog actually carries the statistics
ANALYZE computed, (b) the optimized plan differs between CBO on and off,
i.e. the reorder actually fired.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"
DB = "cbo_demo"


@pytest.fixture(scope="module")
def cbo_tables(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    for t in ("customer", "orders", "lineitem"):
        spark.read.parquet(f"{SF}/{t}.parquet").write.mode("overwrite").saveAsTable(
            f"{DB}.{t}"
        )
        spark.sql(f"ANALYZE TABLE {DB}.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield DB
    spark.sql(f"DROP DATABASE {DB} CASCADE")


def _pessimal_join(spark, db: str):
    """lineitem ⋈ orders written FIRST, the 27-row customer slice LAST —
    the order no one should execute; only stats can prove it."""
    return spark.sql(
        f"""
        SELECT c.c_mktsegment, count(*) AS n
        FROM {db}.lineitem l
        JOIN {db}.orders o ON l.l_orderkey = o.o_orderkey
        JOIN {db}.customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > 9000
        GROUP BY c.c_mktsegment
        """
    )


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_analyze_populates_catalog_stats(spark, cbo_tables):
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {cbo_tables}.orders").collect()
    stats = next((r.data_type for r in detail if r.col_name == "Statistics"), "")
    assert "rows" in stats, f"ANALYZE left no row stats in the catalog: {detail}"


def test_cbo_join_reorder_uses_stats(spark, cbo_tables):
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    plan_off = _optimized_plan(_pessimal_join(spark, cbo_tables))
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan_on = _optimized_plan(_pessimal_join(spark, cbo_tables))
        rows = _pessimal_join(spark, cbo_tables).collect()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")

    assert plan_on != plan_off, (
        "CBO join reorder produced the identical plan — stats not consumed:\n"
        f"{plan_on}"
    )
    # the reordered result must still be correct
    assert sum(r.n for r in rows) > 0
    baseline = {(r.c_mktsegment, r.n) for r in _pessimal_join(spark, cbo_tables).collect()}
    assert {(r.c_mktsegment, r.n) for r in rows} == baseline
