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


def test_lsh_dim_mismatch_fails_fast(spark):
    """ADVICE r3 (medium): a corpus whose embedding dim differs from the
    plane dim must raise at execution time, not silently null-pad every
    sign bit into one shared bucket (which degenerates the banded
    self-join to O(n^2) with meaningless candidates)."""
    import pytest
    from pyspark.sql import Row

    from transilien_api_etl_spark.plans.vectors_q import _lsh_candidate_pairs

    wrong = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i + j) for j in range(8)]) for i in range(4)]
    )
    with pytest.raises(Exception, match="LSH plane dim"):
        _lsh_candidate_pairs(spark, wrong, n_bands=2, band_bits=2).collect()

    # the same corpus with its own dim passed through works, and a
    # conforming 64-dim corpus is unaffected (no degenerate single bucket)
    ok = _lsh_candidate_pairs(spark, wrong, n_bands=2, band_bits=2, dim=8).collect()
    assert all(r.id_a < r.id_b for r in ok)
