#!/usr/bin/env python
"""A/B: JVM-native SQ8 kernels vs the shipped Arrow quantized scan
(round 11 "not yet optimized" item 1 — the round-12-sized experiment,
probed directly so the item closes on a measurement instead of analogy).

The shipped knn_sq8_top10 scan is an Arrow-batched numpy kernel
(operators/quantize.sq8_cosine_arrow). Its residual graded quotient was
adjudicated (round 11, change 8) as the JVM->Python Arrow boundary
constant after batch size, scan parallelism and dequant form all probed
negative. The one lever left on the list was a JVM-native kernel that
never crosses the boundary at all. Two candidate forms, both measured
here at the 1 M x 64 scale cache:

1. ``hof_array``  — the pure-JVM higher-order-function form over the
   list layout: sq8_encode -> sq8_dequant_expr -> dot/l2_norm folds
   (the knn_ivf_sq8_top10 fine-scan shape). Historically 4.31 s vs the
   Arrow kernel's 0.83 s (round 2 A/B, re-measured here on this box).
2. ``flat_codes_codegen`` — the "codegen'd fixed-width codes column"
   sketch: codes stored at rest as 64 INT columns c_00..c_63, cosine
   evaluated as ONE whole-stage-codegen expression with the dequant
   arithmetic inlined per column (plus a ``stored_norm`` variant that
   reads the dequantized-vector L2 norm precomputed at rest — the
   layout an ANN index could legitimately ship, since the norm is
   code-derived). This is the SQ8 analogue of the round-10 flat-column
   exact-kNN A/B, which lost 3.7x to the HotSpot huge-method JIT cliff
   on the inline-norm form and was parity-to-worse with a stored norm.

Every arm's top-10 must equal the registered knn_sq8_top10 result on
the same corpus (bit-exact contract: the flat dequant replays
sq8_dequant_expr's exact arithmetic order, the dot/norm sums are
left-associated like functions/vectors.dot, rounding stays F.round 8dp).

Usage: python scripts/sq8_jvm_kernel_ab.py   (one JSON line; reuses the
bench scale cache, one-time codes-flat twin materialization, ~5 min).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.functions.vectors import dot, l2_norm  # noqa: E402
from transilien_api_etl_spark.io import cached_query_embedding, load_table  # noqa: E402
from transilien_api_etl_spark.operators.quantize import (  # noqa: E402
    sq8_cosine_arrow,
    sq8_dequant_expr,
    sq8_encode,
    sq8_stats_model,
)
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import materialize_scale  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
REPS = 5


def ensure_codes_twin(spark, src_dir: str, mins, maxs) -> str:
    """vec_id, c_00..c_63 (INT codes via sq8_code_expr — identical bits to
    the engine's array<int> codes) + dq_norm = l2_norm of the dequantized
    vector, folded in the engine's sequential order."""
    out = os.path.join(src_dir, "embeddings_sq8_flat.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    enc = sq8_encode(load_table(spark, src_dir, "embeddings"), mins, maxs)
    dqv = sq8_dequant_expr(mins, maxs, "codes")
    cols = [F.col("vec_id")] + [
        F.col("codes")[i].alias(f"c_{i:02d}") for i in range(DIM)
    ]
    cols.append(l2_norm(dqv).alias("dq_norm"))
    enc.select(*cols).write.mode("overwrite").parquet(out)
    return out


def _dq(i: int, mins, maxs):
    # Exact replay of sq8_dequant_expr per element: mn + (c * (mx-mn)) / 255
    return F.lit(float(mins[i])) + (
        F.col(f"c_{i:02d}").cast("double") * F.lit(float(maxs[i]) - float(mins[i]))
    ) / 255


def flat_plan(spark, flat_path: str, mins, maxs, qvec, qn: float, stored_norm: bool):
    df = spark.read.parquet(flat_path).filter(F.col("vec_id") != 0)
    dqs = [_dq(i, mins, maxs) for i in range(DIM)]
    # left-associated sums = the sequential fold of functions/vectors.dot
    dot_e = dqs[0] * F.lit(float(qvec[0]))
    for i in range(1, DIM):
        dot_e = dot_e + dqs[i] * F.lit(float(qvec[i]))
    if stored_norm:
        norm = F.col("dq_norm")
    else:
        sq = dqs[0] * dqs[0]
        for i in range(1, DIM):
            sq = sq + dqs[i] * dqs[i]
        norm = F.sqrt(sq)
    return (
        df.select(
            "vec_id", F.round(dot_e / (norm * F.lit(qn)), 8).alias("cos_q8")
        )
        .orderBy(F.desc("cos_q8"), "vec_id")
        .limit(10)
    )


def hof_plan(emb, mins, maxs, qvec, qn: float):
    corpus = emb.filter(F.col("vec_id") != 0)
    dqv = sq8_dequant_expr(mins, maxs, "codes")
    qv = F.array(*[F.lit(float(x)) for x in qvec])
    enc = sq8_encode(corpus, mins, maxs).withColumn("dqv", dqv)
    cos = dot(F.col("dqv"), qv) / (l2_norm(F.col("dqv")) * F.lit(qn))
    return (
        enc.select("vec_id", F.round(cos, 8).alias("cos_q8"))
        .orderBy(F.desc("cos_q8"), "vec_id")
        .limit(10)
    )


def arrow_plan(emb, mins, maxs, qvec, qn: float):
    scored = sq8_cosine_arrow(
        emb.filter(F.col("vec_id") != 0), mins, maxs, qvec, qn,
        topk_prefilter=10, topk_round_dp=8,
    )
    return (
        scored.select("vec_id", F.round("cos_q8", 8).alias("cos_q8"))
        .orderBy(F.desc("cos_q8"), "vec_id")
        .limit(10)
    )


def time_df(make_df, reps: int = REPS) -> list[float]:
    make_df().count()  # untimed warm
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        make_df().count()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    spark = build_session(app_name="sq8-jvm-kernel-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = bench.SCALE_DIR
    materialize_scale(spark, SF_DIR, d1)

    emb = load_table(spark, d1, "embeddings")
    mins, maxs = sq8_stats_model(emb)  # untimed: kernel A/B, not stats A/B
    flat = ensure_codes_twin(spark, d1, mins, maxs)
    qvec = cached_query_embedding(spark, d1, vec_id=0)
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn**0.5

    # correctness gate: every arm == the registered row on this corpus
    base = [tuple(r) for r in REGISTRY["knn_sq8_top10"].fn(spark, d1).collect()]
    arms = {
        "arrow_kernel": lambda: arrow_plan(emb, mins, maxs, qvec, qn),
        "hof_array": lambda: hof_plan(emb, mins, maxs, qvec, qn),
        "flat_codes_codegen": lambda: flat_plan(
            spark, flat, mins, maxs, qvec, qn, stored_norm=False
        ),
        "flat_codes_stored_norm": lambda: flat_plan(
            spark, flat, mins, maxs, qvec, qn, stored_norm=True
        ),
    }
    for name, mk in arms.items():
        got = [tuple(r) for r in mk().collect()]
        assert got == base, (name, got[:3], base[:3])

    res = {"metric": "sq8_jvm_kernel_ab", "sf_dir": SF_DIR, "queries": {}}
    res["queries"]["registered_fn_with_stats"] = time_df(
        lambda: REGISTRY["knn_sq8_top10"].fn(spark, d1)
    )
    for name, mk in arms.items():
        res["queries"][name] = time_df(mk)

    res["medians"] = {
        k: round(statistics.median(v), 4) for k, v in res["queries"].items()
    }
    m = res["medians"]
    res["ratio_vs_arrow"] = {
        k: round(v / m["arrow_kernel"], 3) for k, v in m.items()
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
