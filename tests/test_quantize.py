"""SQ8 quantization invariants beyond registry parity: code range, bounded
reconstruction error, and quantized-search recall against exact kNN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.quantize import sq8_encode, sq8_stats_model
from transilien_api_etl_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_codes_span_full_byte_range(spark):
    emb = load_table(spark, SF, "embeddings")
    enc = sq8_encode(emb, *sq8_stats_model(emb))
    rng = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    # min/max of each dimension map to code 0 and 255 by construction
    assert rng["lo"] == 0 and rng["hi"] == 255


def test_reconstruction_error_is_bounded_by_step(spark):
    out = REGISTRY["embeddings_quantize_int8"].fn(spark, SF).toPandas()
    emb = load_table(spark, SF, "embeddings")
    mins, maxs = sq8_stats_model(emb)
    # worst-case per-dim error is half a quantization step; MSE must be
    # below the mean squared half-step across dimensions
    bound = sum(((mx - mn) / 255 / 2) ** 2 for mn, mx in zip(mins, maxs))
    bound /= len(mins)
    assert (out["mse"] <= bound + 1e-12).all()
    assert (out["mse"] >= 0).all()


def test_quantized_knn_recall_vs_exact(spark):
    exact = {r["vec_id"] for r in REGISTRY["knn_cosine_top10"].fn(spark, SF).collect()}
    q8 = {r["vec_id"] for r in REGISTRY["knn_sq8_top10"].fn(spark, SF).collect()}
    # SQ8 distorts only the corpus side; top-10 overlap should stay high
    assert len(exact & q8) >= 8, (sorted(exact), sorted(q8))


def test_rounding_formula_matches_decimal_half_up_at_the_tie_edge():
    """floor(v+0.5) is NOT half-up for v just below 0.5: the sum lands
    exactly halfway and ties-to-even rounds it up to 1.0. The kernel's
    frac-based form must agree with decimal HALF_UP (what Spark F.round
    and the DuckDB oracle compute) on exactly these doubles."""
    import numpy as np

    v = np.nextafter(0.5, 0.0)  # largest double < 0.5
    assert np.floor(v + 0.5) == 1.0  # the old formula's wrong answer
    fv = np.floor(v)
    assert fv + (v - fv >= 0.5) == 0.0  # fixed kernel form
    # and at the true tie the fixed form still rounds up (half-UP)
    assert (lambda x: np.floor(x) + (x - np.floor(x) >= 0.5))(0.5) == 1.0


def test_sq8_codes_clamped_for_out_of_stats_rows(spark):
    """Stats from one corpus, encoder applied to later-arriving rows: an
    out-of-range value must clamp to [0, 255], not extrapolate outside
    the byte range."""
    from transilien_api_etl_spark.operators.quantize import sq8_encode

    emb = spark.createDataFrame(
        [(1, [300.0, -5.0]), (2, [100.0, 0.5])], "vec_id long, embedding array<double>"
    )
    codes = {
        r.vec_id: r.codes
        for r in sq8_encode(emb, [0.0, 0.0], [255.0, 1.0]).collect()
    }
    assert codes[1] == [255, 0]  # clamped high / low
    assert all(0 <= c <= 255 for c in codes[2])
