#!/usr/bin/env python
"""A/B: close bucketed q3's residual ratio (VERDICT r5 task 2).

Baseline = the bench phase-2c layout (32-bucket external tables,
clustered+sorted on the order key). Variants tried here, cheapest first:
64 buckets (final-agg parallelism is bucket-capped — two half-size waves
balance better than one full-size wave on 32 threads), AQE
partition-coalescing off, and hash join preferred over the sorted merge.
Each variant reports the warm-rep MEDIAN of 3 plus the plan's Exchange
count, on the 60 M-row scale cache:

    python scripts/q3_bucket_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transilien_api_etl_spark.io import (  # noqa: E402
    BUCKETED_DIR_CONF,
    BUCKETED_TABLES_CONF,
    load_table,
)
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402
from transilien_api_etl_spark.sources.sinks import ensure_bucketed_external  # noqa: E402

import transilien_api_etl_spark.plans  # noqa: E402,F401  (registration)

SCALE = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    "/root/repo/.scale_cache/do200xem500xev100xli100xor100",
)

spark = build_session(
    "q3-bucket-ab",
    extra_conf={
        "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    },
)
spark.sparkContext.setLogLevel("ERROR")


def register_layout(n_buckets: int) -> None:
    suffix = "_bucketed_v2" if n_buckets == 32 else f"_bucketed_v2_{n_buckets}"
    bucket_dir = SCALE.rstrip("/") + suffix
    t0 = time.perf_counter()
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {table}_bucketed")
        ensure_bucketed_external(
            spark,
            load_table(spark, SCALE, table),
            f"{table}_bucketed",
            os.path.join(bucket_dir, table),
            [key],
            n_buckets=n_buckets,
            sort_cols=[key],
            source_id=os.path.abspath(SCALE),
        )
    print(f"# layout {n_buckets} ready in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)


def measure(label: str, names=("q3_shipping_priority", "q5_local_supplier")) -> None:
    spark.conf.set(BUCKETED_TABLES_CONF, "lineitem,orders")
    spark.conf.set(BUCKETED_DIR_CONF, SCALE)
    try:
        for name in names:
            fn = REGISTRY[name].fn
            df = fn(spark, SCALE)
            df.count()  # warm; also finalizes the adaptive plan
            # read the plan AFTER execution — pre-execution it stringifies
            # AQE's initial plan, not what actually ran
            n_ex = df._jdf.queryExecution().executedPlan().toString().count("Exchange")
            raw = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SCALE).count()
                raw.append(round(time.perf_counter() - t0, 4))
            print(
                f"{label:34s} {name}: median {statistics.median(raw):.3f}s "
                f"of {raw} ({n_ex} Exchange)"
            )
    finally:
        spark.conf.set(BUCKETED_TABLES_CONF, "")
        spark.conf.set(BUCKETED_DIR_CONF, "")


register_layout(32)
measure("32 buckets (baseline)")

spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
measure("32 buckets, AQE coalesce off")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
measure("32 buckets, prefer hash join")
spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

register_layout(64)
measure("64 buckets")

spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
measure("64 buckets, AQE coalesce off")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

spark.stop()
