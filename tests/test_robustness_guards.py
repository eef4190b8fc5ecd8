"""Regression tests for the round-6 operator-robustness review: NULL and
out-of-contract inputs must degrade per SQL semantics (NULL out) or fail
fast with a named column — never kill the job with an opaque ANSI cast
error or silently overwrite caller data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.geo import nearest_k_stations
from transilien_api_etl_spark.functions.udfs import (
    token_count_pudf,
    weighted_avg_pudf,
)
from transilien_api_etl_spark.operators.dedup import exact_dedup
from transilien_api_etl_spark.operators.quantize import sq8_code_expr
from transilien_api_etl_spark.operators.skew import with_salt


def test_token_count_null_text_yields_null_not_crash(spark):
    df = spark.createDataFrame([("a b c",), (None,), ("x",)], "text string")
    rows = {r.text: r.n for r in df.select("text", token_count_pudf("text").alias("n")).collect()}
    assert rows["a b c"] == 3
    assert rows["x"] == 1
    assert rows[None] is None


def test_weighted_avg_skips_null_rows_like_sql(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (1, None, 2.0), (1, 3.0, 1.0), (2, None, 1.0)],
        "g long, v double, w double",
    )
    out = {
        r.g: r.wa
        for r in df.groupBy("g").agg(weighted_avg_pudf("v", "w").alias("wa")).collect()
    }
    assert out[1] == 2.0  # (1*1 + 3*1) / 2 — the NULL row skipped
    assert out[2] is None  # all-NULL group


def test_sq8_out_of_range_and_nan_clamp_instead_of_cast_overflow(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 1e14]), (2, [float("nan"), -1e14]), (3, [0.25, 0.75])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.codes
        for r in df.select(
            "vec_id", sq8_code_expr([0.0, 0.0], [1.0, 1.0]).alias("codes")
        ).collect()
    }
    assert out[1] == [128, 255]  # overflow clamps high
    assert out[2] == [255, 0]  # NaN saturates, negative clamps low
    assert out[3] == [64, 191]  # in-range unchanged (parity path)


def test_cosine_kernel_rejects_null_elements(spark):
    from transilien_api_etl_spark.functions.vectors import cosine_scores_arrow

    df = spark.createDataFrame(
        [(1, [1.0, None]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL"):
        cosine_scores_arrow(df, [1.0, 0.0], 1.0).collect()


def test_internal_column_collisions_raise(spark):
    df = spark.createDataFrame([(1, 2)], "k long, __rn long")
    with pytest.raises(ValueError, match="__rn"):
        exact_dedup(df, ["k"], [F.asc("k")])
    df2 = spark.createDataFrame([(1, 0)], "k long, __salt int")
    with pytest.raises(ValueError, match="__salt"):
        with_salt(df2, ["k"], 4)


def test_nearest_k_stations_rejects_overlapping_columns(spark):
    stops = spark.createDataFrame(
        [("S1", 48.8, 2.3)], "stop_id string, stop_lat double, stop_lon double"
    )
    with pytest.raises(ValueError, match="share column names"):
        nearest_k_stations(stops, stops, 2)
    probes = stops.select(
        F.col("stop_id").alias("probe_id"),
        F.col("stop_lat").alias("lat"),
        F.col("stop_lon").alias("lon"),
    )
    assert nearest_k_stations(probes, stops, 2).count() == 1  # renamed form works
