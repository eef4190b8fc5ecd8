"""Quality (not just plumbing) checks for the approximate dedup/ANN paths:
candidate generation must actually FIND the true near-duplicates.

Recall is measured on the fixed sf0.01 corpus, so thresholds are
deterministic; they are set with slack below the measured values to avoid
flaking if generation parameters shift."""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark import plans

SF = "/root/testdata/sf0.01"


def _pair_set(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_candidates_recall_against_exact_jaccard(spark):
    exact_strong = plans.queries()["docs_shingle_jaccard"](spark, SF).filter(
        F.col("jaccard") >= 0.4
    )
    truth = _pair_set(exact_strong)
    assert truth, "fixture should contain strong near-dup pairs"

    cands = _pair_set(plans.queries()["docs_minhash_candidates"](spark, SF), "id_a", "id_b")
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.8, f"MinHash recall {recall:.2f} over {len(truth)} strong pairs"


def test_embedding_lsh_recall_against_exact_cosine(spark):
    exact = plans.queries()["dedup_embedding_cosine"](spark, SF).filter(
        F.col("cos_sim") >= 0.5
    )
    truth = _pair_set(exact, "id_a", "id_b")
    assert truth, "fixture should contain high-cosine pairs"

    cands = _pair_set(plans.queries()["lsh_ann_candidates"](spark, SF), "id_a", "id_b")
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall:.2f} over {len(truth)} high-cos pairs"
