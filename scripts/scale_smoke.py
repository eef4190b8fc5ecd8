#!/usr/bin/env python
"""Scale-stress smoke (task mandate: 'would this plan survive a 100× scale-up?').

Synthesizes N× the sf0.1 events table IN MEMORY (key-space widened with the
replica index, timestamps jittered so sessions don't collapse), then times
the shuffle-heavy operators. Linear-ish scaling here + the plan-shape tests
is the local evidence we can produce for 1000-executor behavior.

Usage: python scripts/scale_smoke.py [replicas=100]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transilien_api_etl_spark.io import load_table  # noqa: E402
from transilien_api_etl_spark.operators.joins import asof_join  # noqa: E402
from transilien_api_etl_spark.operators.sessionize import sessionize  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = build_session(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    e = load_table(spark, SF_DIR, "events")
    n0 = e.count()
    # replicate: widen the user key-space by replica index, jitter ts by a
    # few seconds so windows/sessions stay realistic, keep types identical
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    big = (
        e.crossJoin(r)
        .select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=(F.col("rep") % 97))).alias("ts"),
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(64)
        .persist()
    )
    n = big.count()
    print(f"events: {n0:,} -> {n:,} rows ({replicas}x)")

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label:32s} {dt:7.2f}s  ({out:,} rows)")
        return dt

    timed("tumbling_1h_agg", lambda: (
        big.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .count()
    ))
    timed("sessionize_30m", lambda: (
        sessionize(big, "user_id", "ts", gap_seconds=1800, order_cols=["event_id"])
        .groupBy("user_id", "session_id").count().count()
    ))

    purchases = big.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = big.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    timed("asof_union_strategy", lambda: asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        left_keys=["event_id"], direction="backward", strategy="union",
    ).count())
    timed("exact_dedup_dropdup", lambda: big.dropDuplicates(["user_id", "event_type"]).count())
    timed("topk_per_user", lambda: (
        big.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.desc("value"), "event_id")
            ),
        ).filter(F.col("rn") <= 3).count()
    ))
    spark.stop()


if __name__ == "__main__":
    main()
