"""Salting recipes must be result-identical to their unsalted forms
(SURVEY §5) — correctness is unconditional, only the shuffle layout changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.skew import salted_agg, salted_join, with_salt

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    e = load_table(spark, SF, "events")
    dim = e.select("event_type").distinct().withColumn(
        "type_tag", F.upper(F.col("event_type"))
    )
    plain = {
        (r.event_id, r.type_tag)
        for r in e.join(dim, "event_type").select("event_id", "type_tag").collect()
    }
    salted = {
        (r.event_id, r.type_tag)
        for r in salted_join(e, dim, on=["event_type"], skewed_id_cols=["event_id"], n_salt=8)
        .select("event_id", "type_tag")
        .collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_agg_matches_plain_agg(spark):
    e = load_table(spark, SF, "events")
    plain = {
        (r.event_type, r.n, round(r.v, 6))
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .collect()
    }
    two_phase = salted_agg(
        e,
        keys=["event_type"],
        id_cols=["event_id"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "v": (F.sum("value"), F.round(F.sum("v"), 6)),
        },
        n_salt=8,
    )
    salted = {(r.event_type, r.n, round(r.v, 6)) for r in two_phase.collect()}
    assert salted == plain


def test_salt_is_deterministic_and_bounded(spark):
    e = load_table(spark, SF, "events").limit(100)
    s1 = [r["__salt"] for r in with_salt(e, ["event_id"], 16).select("__salt").collect()]
    s2 = [r["__salt"] for r in with_salt(e, ["event_id"], 16).select("__salt").collect()]
    assert s1 == s2
    assert all(0 <= s < 16 for s in s1)
    assert len(set(s1)) > 1  # actually spreads


def test_connected_components_chain_and_islands(spark):
    from transilien_api_etl_spark.operators.components import connected_components

    # chain 1-2-3-4-5 (diameter 4), pair {10,11}, singleton edges none for 20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long"
    )
    got = {r.node: r.cluster for r in connected_components(edges, "a", "b").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_salted_join_rejects_outer(spark):
    import pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on=["k"], skewed_id_cols=["k"], how="full")
