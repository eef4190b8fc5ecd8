"""Count-min sketch properties vs the exact word-frequency twin.

CMS guarantees (Cormode & Muthukrishnan 2005): a point estimate never
undercounts, and with width W overcounts by more than 2·N/W with
probability ≤ (1/2)^D per independent row (N = total token count). The
assertions below use the deterministic never-undercount bound exactly and
the probabilistic bound loosely (4·N/W) so the test is not flaky while
still failing on any real bucketing bug (a broken hash collapses buckets
and blows the overcount by orders of magnitude).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.text import tokenize
from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import REGISTRY
from transilien_api_etl_spark.plans.sketches_q import CMS_WIDTH

SF = "/root/testdata/sf0.001"


def _exact_counts(spark):
    d = load_table(spark, SF, "documents")
    return (
        d.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )


def test_cms_never_undercounts_and_bounded_overcount(spark):
    est = REGISTRY["sketch_heavy_hitters_cms"].fn(spark, SF)
    exact = _exact_counts(spark)
    n_total = exact.agg(F.sum("true_count")).first()[0]
    joined = est.join(exact, "tok").select("tok", "est_count", "true_count").collect()
    assert joined, "estimate join produced no rows"
    bound = 4.0 * n_total / CMS_WIDTH
    for r in joined:
        assert r.est_count >= r.true_count, f"CMS undercounted {r.tok}"
        assert r.est_count - r.true_count <= bound, (
            f"{r.tok}: est {r.est_count} overshoots true {r.true_count} "
            f"by more than {bound:.0f}"
        )


def test_cms_top_estimates_cover_true_heavy_hitters(spark):
    est_top = {r.tok for r in REGISTRY["sketch_heavy_hitters_cms"].fn(spark, SF).collect()}
    true_top5 = [
        r.tok
        for r in _exact_counts(spark)
        .orderBy(F.desc("true_count"), "tok")
        .limit(5)
        .collect()
    ]
    missed = [t for t in true_top5 if t not in est_top]
    assert not missed, f"true heavy hitters missing from CMS top-30: {missed}"
