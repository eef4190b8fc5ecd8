"""Runtime bloom-filter join pruning (SURVEY §5 optimizer posture): when a
selective filter sits on the build side of a shuffle join, Spark injects a
bloom_filter_agg subquery and pushes might_contain() into the probe-side
scan — rows that cannot match die before the shuffle. At 100 TB this is the
difference between shuffling the whole fact table and shuffling the ~1/5
that survives; locally we lower applicationSideScanSizeThreshold (default
10 GB, i.e. tuned for cluster-scale scans) to make the injection visible."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_SMOKE

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def _with_confs(spark):
    prev = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        spark.conf.set(k, v)


def _build_query(spark):
    # Rebuilt per conf regime: a DataFrame caches its QueryExecution, so a
    # plan derived before the conf change would never see the bloom rule.
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def test_bloom_filter_injected_and_result_unchanged(spark):
    baseline = _build_query(spark).collect()

    prev = _with_confs(spark)
    try:
        q = _build_query(spark)
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
        assert "might_contain" in plan, "no bloom probe pushed to the fact scan"
        assert q.collect() == baseline  # pruning is semantics-preserving
    finally:
        _restore(spark, prev)
