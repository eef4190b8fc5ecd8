"""Dynamic partition pruning (SURVEY §5 optimizer posture): on a
partitioned fact table, a selective dim filter becomes a runtime
dynamicpruningexpression in the fact scan's PartitionFilters — at 100 TB
the fact side reads only the partitions the dim side can match, which is
the core star-join optimization on partitioned lakes."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from .conftest import SF_SMOKE


def test_dpp_prunes_fact_partitions(spark):
    d = tempfile.mkdtemp(prefix="dpp-")
    fact_path = os.path.join(d, "orders_by_priority")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orders.write.partitionBy("o_orderpriority").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim = spark.createDataFrame(
        [("1-URGENT", "keep"), ("2-HIGH", "drop"), ("5-LOW", "drop")],
        "prio string, tag string",
    ).filter(F.col("tag") == "keep")

    q = (
        fact.join(dim, fact.o_orderpriority == dim.prio)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("tp"))
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruningexpression" in plan, "no DPP filter on the fact scan"
    assert "PartitionFilters" in plan

    expected = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("tp"))
        .collect()
    )
    assert q.collect() == expected
