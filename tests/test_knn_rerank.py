"""knn_rerank_top10 — ANN candidates → exact re-rank (VERDICT r10 task 2).

The row's claim is recall 1.0 against EXACT kNN truth while scanning SQ8
codes and exact-scoring only the top-C candidates. At driver SFs ≤ C the
prune is a no-op; these tests manufacture a corpus where the prune bites
5:1 and assert the re-ranked top-10 still equals the exact top-10 — the
CI floor backing the registered oracle's hash-match (the same treatment
dedup_embedding_ann gets in tests/test_lsh_recall.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import transilien_api_etl_spark.plans  # noqa: F401 — populate REGISTRY
from transilien_api_etl_spark.functions.vectors import cosine_scores_arrow
from transilien_api_etl_spark.plans.quantize_q import RERANK_CANDIDATES
from transilien_api_etl_spark.plans.registry import REGISTRY

N_VECS = 5 * RERANK_CANDIDATES  # the SQ8 candidate prune bites 5:1
DIM = 16


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """Deterministic 5 000×16 corpus written in the testdata embeddings
    schema (vec_id long, embedding array<float>, label int)."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    # plant a near-dup cluster of the query so the top of the ranking is
    # genuinely contested (scores separated by < SQ8's quantization error
    # would be a flaky test, so offsets are modest but distinct)
    for i in range(1, 30):
        vecs[i] = vecs[0] + 0.01 * i * vecs[i]
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(i % 7)) for i in range(N_VECS)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path_factory.mktemp("rerank"))
    df.coalesce(2).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_rerank_equals_exact_when_prune_bites(spark, corpus_dir):
    exact = REGISTRY["knn_cosine_top10"].fn(spark, corpus_dir).collect()
    rerank = REGISTRY["knn_rerank_top10"].fn(spark, corpus_dir).collect()
    assert len(exact) == 10
    assert [tuple(r) for r in rerank] == [tuple(r) for r in exact]


def test_keep_vec_passthrough_is_selection_only(spark, corpus_dir):
    """keep_vec=True must change neither the scores nor the kept set —
    and the vectors it attaches must be the rows' own floats."""
    emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in q["embedding"]]
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn**0.5
    corpus = emb.filter(F.col("vec_id") != 0)
    plain = {
        r["vec_id"]: r["cos_sim"]
        for r in cosine_scores_arrow(
            corpus, qvec, qn, topk_prefilter=50, topk_round_dp=8
        ).collect()
    }
    kept = cosine_scores_arrow(
        corpus, qvec, qn, topk_prefilter=50, topk_round_dp=8, keep_vec=True
    ).collect()
    assert {r["vec_id"]: r["cos_sim"] for r in kept} == plain
    originals = {
        r["vec_id"]: r["embedding"]
        for r in corpus.join(
            F.broadcast(
                spark.createDataFrame(
                    [(r["vec_id"],) for r in kept], "vec_id long"
                )
            ),
            "vec_id",
        ).collect()
    }
    for r in kept:
        assert r["embedding"] == originals[r["vec_id"]]


def test_rerank_plan_is_single_corpus_pass(spark, corpus_dir):
    """One scan of the embeddings table in the executed plan: candidates
    carry their vectors, so the exact re-rank never joins back to the
    corpus (the second scan a naive shape would pay at 100 TB)."""
    df = REGISTRY["knn_rerank_top10"].fn(spark, corpus_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "TakeOrderedAndProject" in plan
