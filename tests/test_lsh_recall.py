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


def test_dedup_embedding_ann_recall_floor_sf01(spark):
    """SURVEY §3.12d's recall claim as a CI assertion (VERDICT r6 task 4).

    dedup_embedding_ann's 16×2-bit banding predicts miss probability
    ≈9·10⁻⁴ per qualifying pair; at sf0.1 (2 000 vectors, 4 137 truth
    pairs) the measured recall is 99.93%. Assert the ≥99.9% floor against
    an INDEPENDENT exact oracle (numpy gram matrix over the same parquet)
    so a future banding change cannot silently degrade it. Truth pairs
    within 1e-9 of the τ=0.35 boundary are excluded — those can flip
    between numpy's matmul and the engines' sequential folds without any
    recall regression."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    sf_dir = "/root/testdata/sf0.1"
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip("sf0.1 testdata not present")

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0.0] = np.nan  # zero vectors qualify for nothing
    gram = (vecs / norms) @ (vecs / norms).T
    iu, ju = np.triu_indices(len(ids), k=1)
    sel = gram[iu, ju] >= 0.35 + 1e-9
    truth = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[sel]], ids[ju[sel]])
    }
    assert len(truth) > 1000, "sf0.1 fixture should hold thousands of pairs"

    cands = _pair_set(
        plans.queries()["dedup_embedding_ann"](spark, sf_dir), "id_a", "id_b"
    )
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.999, (
        f"ANN recall {recall:.4f} over {len(truth)} pairs "
        f"({len(truth - cands)} missed) — banding degraded below the "
        "SURVEY §3.12d floor"
    )
