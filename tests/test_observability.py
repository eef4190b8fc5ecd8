"""Pipeline observability (production posture): `observe()` attaches
accumulator-backed metrics to a plan so row counts / sums are collected as
a side effect of the action — no second scan. At 100 TB a second
"count the rows we processed" pass is a second 100 TB scan; this is how an
engine reports data-quality counters for free."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from .conftest import SF_SMOKE


def test_observed_metrics_match_action(spark):
    obs = Observation("ingest")
    df = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.sum(F.col("o_totalprice").isNull().cast("int")).alias("null_prices"),
        )
        .where(F.col("o_orderpriority") == "1-URGENT")
    )
    n_filtered = df.count()
    got = obs.get
    # Metrics observe the PRE-filter stream (they sit where attached).
    full = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert got["n_rows"] == full.count() > n_filtered
    assert got["null_prices"] == 0
    expected_tp = full.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert abs(got["total_price"] - expected_tp) < 0.01
