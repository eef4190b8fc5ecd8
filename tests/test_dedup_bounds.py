"""Scale-bound guarantees of the dedup family: hot-shingle fan-out caps,
LSH bucket caps, signature-width validation, and O(log n) connected
components (the properties that keep these operators alive at 100 TB,
checked on crafted worst-case inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.operators.components import connected_components
from transilien_api_etl_spark.operators.dedup import jaccard_pairs, minhash_signature_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_jaccard_hot_shingle_capped(spark):
    # 30 docs all share one boilerplate shingle ('x y z') but are otherwise
    # unrelated; two docs are genuine near-dups via rare shingles. With the
    # cap the hot shingle contributes NO join rows, so only the real pair
    # survives — uncapped it alone fans out 30*29/2 = 435 candidate rows.
    rows = [(i, f"x y z u{i} v{i} w{i}") for i in range(30)]
    rows += [(100, "p q r s t p q r s t"), (101, "p q r s t p q r s q")]
    df = _docs(spark, rows)
    toks = F.split(F.col("text"), " ")
    sh3 = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
    )

    capped = jaccard_pairs(df, "doc_id", sh3, min_jaccard=0.01, max_df=10)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(100, 101)}

    uncapped = jaccard_pairs(df, "doc_id", sh3, min_jaccard=0.01, max_df=None)
    assert uncapped.count() > 400  # the fan-out the cap exists to prevent


def test_minhash_rejects_ragged_bands(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="multiple of band_size"):
        minhash_signature_pairs(df, "doc_id", F.split(F.col("text"), " "), 10, 4)


def test_minhash_hot_bucket_capped(spark):
    # 40 identical docs land in the same bucket of EVERY band: uncapped
    # that is 40*39/2 pairs; with max_bucket_size=10 the degenerate buckets
    # are dropped while a small genuine dup-pair is still recalled.
    rows = [(i, "same boilerplate text repeated everywhere forever") for i in range(40)]
    rows += [(200, "alpha beta gamma delta epsilon zeta"), (201, "alpha beta gamma delta epsilon eta")]
    df = _docs(spark, rows)
    toks = F.split(F.col("text"), " ")

    capped = minhash_signature_pairs(df, "doc_id", toks, 16, 4, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(200, 201)}

    uncapped = minhash_signature_pairs(df, "doc_id", toks, 16, 4, max_bucket_size=None)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_connected_components_log_rounds_on_path_graph(spark):
    # A 64-node path is the propagation worst case: min-label flooding
    # needs 63 rounds; alternating large/small-star must finish in O(log n)
    # — max_iter=10 would blow up if the implementation were linear.
    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "s long, d long")
    labels = connected_components(edges, "s", "d", max_iter=10)
    rows = labels.collect()
    assert len(rows) == n
    assert {r.cluster for r in rows} == {0}

    # two components + correctness of min-label assignment
    edges2 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "s long, d long"
    )
    got = {r.node: r.cluster for r in connected_components(edges2, "s", "d").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_quadratic_oracle_twin_guard(spark, monkeypatch):
    from transilien_api_etl_spark.plans import vectors_q

    monkeypatch.delenv("SPARK_GRAFT_ALLOW_QUADRATIC", raising=False)
    big = spark.range(vectors_q.MAX_QUADRATIC_ROWS + 1)
    with pytest.raises(ValueError, match="oracle twin"):
        vectors_q._guard_quadratic(big, "dedup_embedding_cosine")
    monkeypatch.setenv("SPARK_GRAFT_ALLOW_QUADRATIC", "1")
    vectors_q._guard_quadratic(big, "dedup_embedding_cosine")  # no raise
