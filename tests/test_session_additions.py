"""Property checks for this session's operators beyond registry parity:
segment dedup invariants, interpolation bounds, moment stats vs numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_segment_dedup_invariants(spark):
    out = REGISTRY["docs_segment_dedup"].fn(spark, SF).toPandas()
    docs = load_table(spark, SF, "documents")
    k = 10
    blocks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / {k}.0) as int) - 1), "
                f"i -> array_join(slice(split(text, ' '), i * {k} + 1, {k}), ' '))"
            )
        ).alias("block_no", "block_text"),
    )
    n_blocks = blocks.count()
    n_distinct = blocks.select("block_text").distinct().count()
    # keep-first keeps exactly one occurrence of every distinct block
    assert int(out["blocks_kept"].sum()) == n_distinct
    assert int((out["blocks_kept"] + out["blocks_dropped"]).sum()) == n_blocks
    # per-doc accounting: kept text word count == 10*full kept blocks (+ tail)
    assert (out["blocks_kept"] >= 0).all() and (out["blocks_dropped"] >= 0).all()


def test_interpolation_is_bounded_by_user_range(spark):
    out = REGISTRY["events_interpolate_linear"].fn(spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .toPandas()
    )
    m = out.merge(ev, on="user_id")
    assert m["value_interp"].notna().all()  # grid spans [min ts, max ts]
    eps = 1e-9
    assert (m["value_interp"] >= m["lo"] - eps).all()
    assert (m["value_interp"] <= m["hi"] + eps).all()


def test_moment_stats_match_numpy(spark):
    out = REGISTRY["agg_moment_stats"].fn(spark, SF).toPandas().set_index("event_type")
    ev = load_table(spark, SF, "events").select("event_type", "value").toPandas()
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        mu, sd = v.mean(), v.std(ddof=1)
        centered = v - mu
        skew = (centered**3).mean() / (v.std(ddof=0) ** 3)
        kurt = (centered**4).mean() / (v.std(ddof=0) ** 4) - 3
        row = out.loc[et]
        assert row["n"] == len(v)
        assert abs(row["mean_value"] - mu) < 1e-4
        assert abs(row["stddev_value"] - sd) < 1e-4
        assert abs(row["skew_pop"] - skew) < 1e-4
        assert abs(row["kurt_pop"] - kurt) < 1e-4
