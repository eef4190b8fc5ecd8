"""Bit-parity property tests for the Arrow-batched numpy kernels.

The round-3 perf kernels (functions/vectors.cosine_scores_arrow,
operators/quantize.sq8_cosine_arrow) claim EXACT-bit equality with the
JVM higher-order-function folds because they replay the same IEEE ops in
the same sequential order. That claim was verified on the fixture corpus;
these tests re-verify it as a property over adversarial inputs —
negatives, zeros, constant dimensions (SQ8's mx==mn guard), tiny and
large magnitudes — so a future kernel edit that silently reorders the
arithmetic fails here, not in the driver's hash compare.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.vectors import (
    cosine_from_norms,
    cosine_scores_arrow,
    dot,
    l2_norm,
)
from transilien_api_etl_spark.operators.quantize import (
    sq8_cosine_arrow,
    sq8_dequant_expr,
    sq8_encode,
    sq8_stats_model,
)

DIM = 16


def _corpus(spark, n=300, seed=7):
    rng = random.Random(seed)

    def vec(i):
        if i % 17 == 0:
            base = [0.0] * DIM  # zero-ish vectors stress the norm path
            base[i % DIM] = 1e-6
            return base
        return [
            rng.uniform(-10.0, 10.0) * (10.0 ** rng.randint(-3, 3))
            for _ in range(DIM)
        ]

    rows = [(i, vec(i)) for i in range(n)]
    # constant dimension across the corpus → SQ8 mx==mn guard fires
    rows = [(i, v[:-1] + [3.25]) for i, v in rows]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_arrow_bit_equals_hof_fold(spark):
    emb = _corpus(spark)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn ** 0.5

    qv = F.array(*[F.lit(x) for x in qvec])
    hof = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            cosine_from_norms(
                F.col("embedding"), qv, l2_norm(F.col("embedding")), F.lit(qn)
            ).alias("cos_sim"),
        )
        .orderBy("vec_id")
        .collect()
    )
    arrow = (
        cosine_scores_arrow(emb.filter(F.col("vec_id") != 0), qvec, qn)
        .orderBy("vec_id")
        .collect()
    )
    assert [(r["vec_id"], r["cos_sim"]) for r in hof] == [
        (r["vec_id"], r["cos_sim"]) for r in arrow
    ]  # EXACT float equality — no tolerance


def test_sq8_arrow_bit_equals_hof_fold(spark):
    emb = _corpus(spark, seed=13)
    mins, maxs = sq8_stats_model(emb)
    assert mins[-1] == maxs[-1] == 3.25  # the constant-dim guard is exercised
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn ** 0.5

    qv = F.array(*[F.lit(x) for x in qvec])
    enc = sq8_encode(emb.filter(F.col("vec_id") != 0), mins, maxs)
    dq = enc.withColumn("dqv", sq8_dequant_expr(mins, maxs, "codes"))
    hof = (
        dq.select(
            "vec_id",
            (dot(F.col("dqv"), qv) / (l2_norm(F.col("dqv")) * F.lit(qn))).alias(
                "cos_q8"
            ),
        )
        .orderBy("vec_id")
        .collect()
    )
    arrow = (
        sq8_cosine_arrow(emb.filter(F.col("vec_id") != 0), mins, maxs, qvec, qn)
        .orderBy("vec_id")
        .collect()
    )
    assert [(r["vec_id"], r["cos_q8"]) for r in hof] == [
        (r["vec_id"], r["cos_q8"]) for r in arrow
    ]  # EXACT float equality — encode, dequant, and fold all replayed
