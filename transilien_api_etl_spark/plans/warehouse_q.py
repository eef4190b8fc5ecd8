"""Warehouse / lakehouse plans — SURVEY §3.1 S5 (transactional MERGE).

The registered query materializes a lakehouse table from ``orders``, runs
one transactional MERGE (update + insert + delete legs in a single commit),
and returns an aggregate of the post-merge snapshot. The oracle states the
MERGE result algebraically over the same view, so every leg of the merge is
value-checked, not just row-counted.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table, materialize_small
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs
from transilien_api_etl_spark.sources import lakehouse as lh

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


@register(
    "lakehouse_merge_orders",
    doc="ACID MERGE on the manifest-versioned lakehouse table "
    "(sources/lakehouse.py): target = orders with o_orderkey%10<8; one "
    "MERGE applies updates (%10==0 → price doubled), deletes (%10==1) and "
    "inserts (%10∈{8,9}) in a single atomic commit with file-range "
    "pruning. Output aggregates the post-merge snapshot per priority; the "
    "oracle derives the same snapshot algebraically (anti-join + union).",
    tags=("warehouse", "merge", "sink"),
    oracle="""
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 10 < 8
),
final AS (
  SELECT * FROM t WHERE o_orderkey % 10 NOT IN (0, 1)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 10 IN (8, 9)
)
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def lakehouse_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders").select(*_COLS)
    table = tempfile.mkdtemp(prefix="lakehouse-orders-")
    try:
        target = o.where(F.col("o_orderkey") % 10 < 8)
        lh.create_table(spark, table, target, ["o_orderkey"])

        updates = (
            o.where(F.col("o_orderkey") % 10 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("is_delete", F.lit(False))
        )
        deletes = o.where(F.col("o_orderkey") % 10 == 1).withColumn(
            "is_delete", F.lit(True)
        )
        inserts = o.where(F.col("o_orderkey") % 10 >= 8).withColumn(
            "is_delete", F.lit(False)
        )
        source = updates.unionByName(deletes).unionByName(inserts)
        lh.merge_into(spark, table, source, delete_col="is_delete")

        final = lh.read_table(spark, table)
        result = (
            final.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .orderBy("o_orderpriority")
        )
        # Materialize before the table dir is deleted — the returned frame
        # must stay valid for the driver's collect().
        out = materialize_small(result)
        return out
    finally:
        shutil.rmtree(table, ignore_errors=True)


@register(
    "lakehouse_cdc_orders",
    doc="CDC change feed between two lakehouse versions (sources/"
    "lakehouse.py change_feed, SURVEY §3.11 Y11): v0 = orders with "
    "o_orderkey%10<8, v1 = after the same MERGE lakehouse_merge_orders "
    "applies; the feed is the file-diff-pruned key-joined snapshot "
    "delta. Output = per-change-type counts and price sums; the oracle "
    "derives each class algebraically (update_postimage = %10==0 at "
    "doubled price, delete = %10==1 at old price, insert = %10∈{8,9}).",
    tags=("warehouse", "cdc", "lakehouse"),
    oracle="""
WITH feed AS (
  SELECT 'delete' AS change_type, o_totalprice
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT 'insert', o_totalprice FROM orders WHERE o_orderkey % 10 IN (8, 9)
  UNION ALL
  SELECT 'update_postimage', o_totalprice * 2 FROM orders WHERE o_orderkey % 10 = 0
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM feed GROUP BY change_type ORDER BY change_type
""",
)
def lakehouse_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders").select(*_COLS)
    table = tempfile.mkdtemp(prefix="lakehouse-cdc-")
    try:
        target = o.where(F.col("o_orderkey") % 10 < 8)
        lh.create_table(spark, table, target, ["o_orderkey"])
        updates = (
            o.where(F.col("o_orderkey") % 10 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("is_delete", F.lit(False))
        )
        deletes = o.where(F.col("o_orderkey") % 10 == 1).withColumn(
            "is_delete", F.lit(True)
        )
        inserts = o.where(F.col("o_orderkey") % 10 >= 8).withColumn(
            "is_delete", F.lit(False)
        )
        lh.merge_into(
            spark,
            table,
            updates.unionByName(deletes).unionByName(inserts),
            delete_col="is_delete",
        )
        feed = lh.change_feed(spark, table, 0, 1)
        result = (
            feed.groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
            .orderBy("change_type")
        )
        return materialize_small(result)
    finally:
        shutil.rmtree(table, ignore_errors=True)


@register(
    "lakehouse_time_travel_orders",
    doc="Snapshot isolation / time travel (SURVEY §3.11 Y11): after the "
    "MERGE commits v1, reading AS OF v0 must still return the pre-merge "
    "table bit-for-bit — the oracle is simply the v0 derivation from the "
    "source table. Proves old manifests stay readable and untouched "
    "files are immutable.",
    tags=("warehouse", "time-travel", "lakehouse"),
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders WHERE o_orderkey % 10 < 8
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def lakehouse_time_travel_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders").select(*_COLS)
    table = tempfile.mkdtemp(prefix="lakehouse-tt-")
    try:
        target = o.where(F.col("o_orderkey") % 10 < 8)
        lh.create_table(spark, table, target, ["o_orderkey"])
        # commit a second version that rewrites/deletes/adds rows
        lh.merge_into(
            spark,
            table,
            o.where(F.col("o_orderkey") % 10 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("is_delete", F.lit(False)),
            delete_col="is_delete",
        )
        v0 = lh.read_table(spark, table, version=0)
        result = (
            v0.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
            .orderBy("o_orderpriority")
        )
        return materialize_small(result)
    finally:
        shutil.rmtree(table, ignore_errors=True)
