"""Large-k / large-n Arrow paths vs their JVM twins (round-7 scale work).

The registered semdedup/PQ queries switch physical strategy above a size
threshold no driver SF reaches (kmeans.ARROW_K_MIN, pq_q._ARROW_MIN_N,
semdedup_q._TARGET_CLUSTER): these tests pin that the Arrow kernels compute
the SAME assignments / codes / dup sets as the oracle-parity JVM forms on
data small enough to run both — so the scale path can't silently drift from
the hash-checked semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators import kmeans as km_mod
from transilien_api_etl_spark.operators.kmeans import kmeans_assign
from transilien_api_etl_spark.operators.pq import (
    pq_codes_arrow,
    pq_codes_col,
    pq_train,
    pq_train_sample_mod,
)
from transilien_api_etl_spark.operators.semdedup import within_cluster_survivors

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def test_kmeans_arrow_assignment_matches_jvm(spark, monkeypatch):
    """k=18 ≥ ARROW_K_MIN routes through the matmul kernel; forcing the
    JVM literal path on the same k must yield identical (cluster, d2)
    maps — 6-dp rounding absorbs the summation-order difference on this
    data (blob-free real vectors, well-off the rounding boundary)."""
    emb = _emb(spark)
    arrow = kmeans_assign(emb, id_col="vec_id", vec_col="embedding", k=18, iterations=2)
    got_arrow = {r["vec_id"]: (r["cluster"], r["d2"]) for r in arrow.collect()}

    monkeypatch.setattr(km_mod, "ARROW_K_MIN", 10_000)
    jvm = kmeans_assign(emb, id_col="vec_id", vec_col="embedding", k=18, iterations=2)
    got_jvm = {r["vec_id"]: (r["cluster"], r["d2"]) for r in jvm.collect()}

    assert set(got_arrow) == set(got_jvm)
    diff_cluster = [i for i in got_jvm if got_arrow[i][0] != got_jvm[i][0]]
    assert diff_cluster == []
    for i in got_jvm:
        assert got_arrow[i][1] == pytest.approx(got_jvm[i][1], abs=2e-6)


def test_semdedup_arrow_prune_matches_jvm_join(spark):
    """Gram-kernel dup set ≡ the JVM self-join dup set on sf0.001 with the
    registered k=8 clustering (both computable at this size)."""
    from transilien_api_etl_spark.functions.vectors import cosine_from_norms, l2_norm
    from transilien_api_etl_spark.plans.semdedup_q import _TAU, _kmeans_df

    km, k, _ = _kmeans_df(spark, SF)
    assert k == 8  # sf0.001 must stay in the oracle's k domain
    arrow_surv = {
        (r["vec_id"], r["cluster"])
        for r in within_cluster_survivors(km, _TAU).collect()
    }

    kmn = km.withColumn("nrm", l2_norm(F.col("v")))
    a, b = kmn.alias("a"), kmn.alias("b")
    cos = F.round(
        cosine_from_norms(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")),
        6,
    )
    jvm_dups = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= F.lit(_TAU))
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    jvm_surv = {
        (r["vec_id"], r["cluster"])
        for r in km.join(jvm_dups, "vec_id", "left_anti")
        .select("vec_id", "cluster")
        .collect()
    }
    assert arrow_surv == jvm_surv


def test_pq_arrow_codes_match_jvm(spark):
    emb = _emb(spark)
    books = pq_train(
        emb, id_col="vec_id", vec_col="embedding",
        m_sub=16, sub_dim=4, k=16, iterations=2,
    )
    jvm = {
        r["vec_id"]: list(r["codes"])
        for r in emb.select(
            "vec_id", pq_codes_col(books, "embedding", 4).alias("codes")
        ).collect()
    }
    arrow = {
        r["vec_id"]: list(r["codes"])
        for r in pq_codes_arrow(
            emb, books, 4, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    assert jvm == arrow


def test_pq_train_sample_mod_thresholds():
    assert pq_train_sample_mod(500) == 1
    assert pq_train_sample_mod(65536) == 1
    assert pq_train_sample_mod(1_000_000) == 15
    # sampled training still selects a non-trivial subset deterministically
    assert pq_train_sample_mod(10_000_000) == 152


def test_derived_k_stays_at_oracle_k_for_all_driver_sfs():
    from transilien_api_etl_spark.plans.semdedup_q import _K, _derived_k

    # driver SFs hold 500 / 500 / 2000 vectors; the oracle's k=8 domain
    # extends to 32k — an sf1 testdata (~20k) would STILL be in-domain.
    for n in (500, 2000, 20_000, 32_000):
        assert _derived_k(n) == _K
    # above the domain: k = n/target (see the schedule-choice note —
    # k=sqrt(n) measured 2.9x slower at 1M despite the nicer asymptotics)
    assert _derived_k(1_000_000) == 250


def test_semdedup_prune_handles_trivial_and_skewed_groups(spark):
    # one singleton cluster, one cluster of exact duplicates: the singleton
    # never drops; in the dup cluster everyone but the smallest id drops.
    rows = [(1, [1.0, 0.0], 0)] + [(10 + i, [0.0, 2.0], 1) for i in range(5)]
    km = spark.createDataFrame(rows, "vec_id long, v array<double>, cluster int")
    surv = {r["vec_id"] for r in within_cluster_survivors(km, 0.9).collect()}
    assert surv == {1, 10}


def test_semdedup_prune_nan_cosine_counts_as_dup(spark):
    """NaN-poisoned vectors yield NaN cosines; Spark and DuckDB both
    compare NaN ABOVE every value, so the JVM filter cos >= tau drops
    them — the Arrow kernel must agree (round-7 review finding). The
    zero-norm sibling case is NOT JVM-comparable: 0/0 raises
    DIVIDE_BY_ZERO under ANSI instead of producing NaN, and the kernel
    deliberately degrades (drops the row) rather than job-kills — see
    the kernel docstring."""
    from pyspark.sql import functions as F

    nan = float("nan")
    rows = [(1, [1.0, 0.0], 0), (2, [nan, 1.0], 0), (3, [nan, 2.0], 0)]
    km = spark.createDataFrame(rows, "vec_id long, v array<double>, cluster int")
    surv = {r["vec_id"] for r in within_cluster_survivors(km, 0.9).collect()}
    # JVM reference on the same frame
    from transilien_api_etl_spark.functions.vectors import cosine_from_norms, l2_norm

    kmn = km.withColumn("nrm", l2_norm(F.col("v")))
    a, b = kmn.alias("a"), kmn.alias("b")
    cos = F.round(
        cosine_from_norms(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")),
        6,
    )
    dups = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= F.lit(0.9))
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    jvm_surv = {
        r["vec_id"] for r in km.join(dups, "vec_id", "left_anti").collect()
    }
    assert surv == jvm_surv == {1}
