#!/usr/bin/env python
"""Round-12 parity gate for the PQ Arrow switch.

Round 12 made the Arrow matmul kernel the ONLY encode path (final encode
at every corpus size, and the per-iteration train assignment). The kernel's
declared contract is "same rounding, same lowest-cid tie-break, only the
float summation order differs"; this script verifies the stronger empirical
claim the plans now rely on — that on every dataset the driver actually
checks, the summation-order difference never crosses a 6-dp rounding
boundary in a way that changes an argmin:

1. codes(old JVM fold) == codes(Arrow kernel) for the final trained books,
   at sf0.001 / sf0.01 / sf0.1 and at the bench-twin bound on the scale
   cache when present;
2. books(old fold-driven Lloyd) == books(Arrow-driven Lloyd) at the same
   points (iteration-by-iteration equality of codes implies equality of
   the rounded per-(m,cid,d) means, but the final-book check is the
   end-to-end form).

Exit code 0 = bit-identical everywhere checked.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from transilien_api_etl_spark import plans  # noqa: F401,E402
from transilien_api_etl_spark.io import (  # noqa: E402
    cached_bounded_count,
    cached_row_count,
    load_table,
    widen_small_scan,
)
from transilien_api_etl_spark.operators.pq import (  # noqa: E402
    pq_codes_arrow,
    pq_codes_col,
    pq_train,
    pq_train_sample_mod,
)
from transilien_api_etl_spark.plans.pq_q import (  # noqa: E402
    _ARROW_MIN_N,
    _BENCH_VEC_BOUND,
    ITERS,
    K_CODES,
    M_SUB,
    SUB_DIM,
)
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402


def old_pq_train(emb, *, id_col, vec_col, sample_mod):
    """The round-11 train loop: per-iteration assignment via the JVM
    transform fold (pq_codes_col), verbatim except for the fused-Arrow
    swap under test."""
    df = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if sample_mod > 1:
        df = df.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    df = widen_small_scan(emb.sparkSession, df)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    init = df.orderBy(id_col).limit(K_CODES).select("v").collect()
    books = [
        [
            (cid, [float(x) for x in r["v"][m * SUB_DIM: (m + 1) * SUB_DIM]])
            for cid, r in enumerate(init)
        ]
        for m in range(M_SUB)
    ]
    for _ in range(ITERS):
        codes = pq_codes_col(books, "v", SUB_DIM)
        ex = df.select(F.col("v").alias("v0"), F.posexplode(codes).alias("m", "cid"))
        vals = ex.select(
            "m",
            "cid",
            F.posexplode(
                F.slice(F.col("v0"), F.col("m") * SUB_DIM + 1, F.lit(SUB_DIM))
            ).alias("d", "val"),
        )
        rows = (
            vals.groupBy("m", "cid", "d")
            .agg(F.round(F.avg("val"), 6).alias("val"))
            .collect()
        )
        by_m = {}
        for r in rows:
            by_m.setdefault(r["m"], {}).setdefault(r["cid"], {})[r["d"]] = r["val"]
        books = [
            [
                (cid, [dims[d] for d in sorted(dims)])
                for cid, dims in sorted(by_m.get(m, {}).items())
            ]
            for m in range(M_SUB)
        ]
    df.unpersist()
    return books


def check(spark, sf_dir: str, vec_bound: int | None) -> bool:
    emb = load_table(spark, sf_dir, "embeddings")
    if vec_bound is None:
        n = cached_row_count(spark, sf_dir, "embeddings")
    else:
        emb = emb.filter(F.col("vec_id") < vec_bound)
        n = cached_bounded_count(spark, sf_dir, "embeddings", "vec_id", vec_bound)
    mod = pq_train_sample_mod(n) if n >= _ARROW_MIN_N else 1
    books_old = old_pq_train(emb, id_col="vec_id", vec_col="embedding", sample_mod=mod)
    books_new = pq_train(
        emb, id_col="vec_id", vec_col="embedding",
        m_sub=M_SUB, sub_dim=SUB_DIM, k=K_CODES, iterations=ITERS, sample_mod=mod,
    )
    books_ok = books_old == books_new
    enc_old = (
        emb.select("vec_id", pq_codes_col(books_old, "embedding", SUB_DIM).alias("codes"))
        .orderBy("vec_id").collect()
    )
    enc_new = (
        pq_codes_arrow(emb, books_old, SUB_DIM, id_col="vec_id", vec_col="embedding")
        .orderBy("vec_id").collect()
    )
    codes_ok = enc_old == enc_new
    print(
        f"{sf_dir} bound={vec_bound} n={n} mod={mod}: "
        f"books_identical={books_ok} codes_identical={codes_ok} rows={len(enc_old)}"
    )
    return books_ok and codes_ok


def main() -> int:
    spark = build_session(app_name="r12_pq_arrow_parity")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.01").count()
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        ok &= check(spark, f"/root/testdata/{sf}", None)
    scale_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR") or os.path.join(
        REPO, ".scale_cache", "do200xem500xev100xli100xor100"
    )
    if os.path.isdir(scale_dir):
        ok &= check(spark, scale_dir, _BENCH_VEC_BOUND)
    else:
        print(f"scale cache absent at {scale_dir}; skipped the twin-bound point")
    spark.stop()
    print("PARITY:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
