#!/usr/bin/env python
"""Round-12 decomposition probe for the three biggest sf0.1 headline walls
(knn_pq_adc_top10 3.5 s, semdedup_survivors 4.0 s, docs_minhash_candidates
3.0 s in the driver's BENCH_r11 artifact).

Times each pipeline phase separately (guide §1: measure first, isolate the
expensive stage) so the round-12 trims target the measured cost, not the
assumed one. Read-only: no repo state is touched.

NOTE: the PQ phases below time the LEGACY interpreted-fold path
(pq_codes_col) on purpose — they are the BEFORE measurements that
motivated round 12's Arrow train/encode switch. The shipped query path
is pq_codes_arrow (operators/pq.py); its close-out decomposition is in
OPTIMIZATION_r12.md "Session close".
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from transilien_api_etl_spark import plans  # noqa: F401,E402
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, reps=3):
    # one warm + reps timed
    fn()
    raw = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        raw.append(time.perf_counter() - t0)
    raw.sort()
    print(f"  {label:55s} {raw[len(raw)//2]:7.3f}s  {[round(x,3) for x in raw]}")
    return raw[len(raw) // 2]


def main():
    spark = build_session(app_name="r12_wall_decomp")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from transilien_api_etl_spark.io import (
        cached_query_embedding,
        cached_row_count,
        load_table,
        widen_small_scan,
    )

    # global warm
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).count()

    # ---------------- full-query walls, for reference ----------------
    print("== full queries (fn at sf0.1) ==")
    for name in ("knn_pq_adc_top10", "semdedup_survivors",
                 "docs_minhash_candidates", "embeddings_kmeans",
                 "embeddings_pq_codes"):
        fn = REGISTRY[name].fn
        t(name, lambda fn=fn: fn(spark, SF_DIR).count())

    # ---------------- PQ decomposition ----------------
    print("== knn_pq_adc_top10 phases ==")
    from transilien_api_etl_spark.operators.pq import (
        adc_distance_col,
        adc_luts,
        pq_codes_col,
        pq_train,
    )
    from transilien_api_etl_spark.plans import pq_q

    emb = load_table(spark, SF_DIR, "embeddings")
    n = cached_row_count(spark, SF_DIR, "embeddings")
    print(f"  n = {n}")

    def train():
        return pq_train(emb, id_col="vec_id", vec_col="embedding",
                        m_sub=pq_q.M_SUB, sub_dim=pq_q.SUB_DIM,
                        k=pq_q.K_CODES, iterations=pq_q.ITERS, sample_mod=1)

    t("pq_train (persist+init+2 iters)", train)
    books = train()

    t("pq_codes_col build (expr string)",
      lambda: pq_codes_col(books, "embedding", pq_q.SUB_DIM), reps=3)

    def encode_count():
        enc = emb.select("vec_id", pq_codes_col(books, "embedding",
                                                pq_q.SUB_DIM).alias("codes"))
        enc.count()

    t("encode scan + count", encode_count)

    qvec = cached_query_embedding(spark, SF_DIR, vec_id=0)
    luts = adc_luts(books, qvec, pq_q.SUB_DIM)

    def adc_only():
        enc = emb.select("vec_id", pq_codes_col(books, "embedding",
                                                pq_q.SUB_DIM).alias("codes"))
        (enc.filter(F.col("vec_id") != 0)
            .select("vec_id", adc_distance_col(luts, "codes").alias("adc_d2"))
            .orderBy("adc_d2", "vec_id").limit(10).count())

    t("encode+ADC+top10 (one job)", adc_only)

    # inside pq_train: how much is init vs per-iteration?
    from pyspark import StorageLevel
    df0 = emb.select(
        F.col("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    t("widen_small_scan call (getNumPartitions+repartition)",
      lambda: widen_small_scan(spark, df0))
    dfw = widen_small_scan(spark, df0).persist(StorageLevel.MEMORY_AND_DISK)
    t("init collect (orderBy limit k)",
      lambda: dfw.orderBy("vec_id").limit(pq_q.K_CODES).select("v").collect())

    def one_iter():
        codes = pq_codes_col(books, "v", pq_q.SUB_DIM)
        ex = dfw.select(F.col("v").alias("v0"),
                        F.posexplode(codes).alias("m", "cid"))
        vals = ex.select(
            "m", "cid",
            F.posexplode(F.slice(F.col("v0"), F.col("m") * pq_q.SUB_DIM + 1,
                                 F.lit(pq_q.SUB_DIM))).alias("d", "val"))
        (vals.groupBy("m", "cid", "d")
             .agg(F.round(F.avg("val"), 6).alias("val")).collect())

    t("one Lloyd iteration (assign+update collect)", one_iter)
    dfw.unpersist()

    # ---------------- semdedup decomposition ----------------
    print("== semdedup_survivors phases ==")
    from transilien_api_etl_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_fit,
    )
    from transilien_api_etl_spark.plans import semdedup_q

    t("kmeans_fit (k=8, 2 iters)",
      lambda: kmeans_fit(emb, id_col="vec_id", vec_col="embedding",
                         k=8, iterations=2))
    cents = kmeans_fit(emb, id_col="vec_id", vec_col="embedding",
                       k=8, iterations=2)

    def assign_count():
        kmeans_assign(emb, id_col="vec_id", vec_col="embedding",
                      k=8, iterations=2).count()

    t("kmeans_assign + count (fit + final scan)", assign_count)

    def full_survivors():
        semdedup_q._survivors(spark, SF_DIR).count()

    t("full _survivors", full_survivors)

    # anti-join alone over a precomputed assignment
    from transilien_api_etl_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )
    km = kmeans_assign(emb, id_col="vec_id", vec_col="embedding",
                       k=8, iterations=2)
    kmp = km.persist(StorageLevel.MEMORY_AND_DISK)
    kmp.count()

    def anti_only():
        kmn = kmp.withColumn("nrm", l2_norm(F.col("v")))
        a, b = kmn.alias("a"), kmn.alias("b")
        cos = F.round(cosine_from_norms(F.col("a.v"), F.col("b.v"),
                                        F.col("a.nrm"), F.col("b.nrm")), 6)
        (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("b.vec_id") < F.col("a.vec_id"))
                & (cos >= F.lit(0.25)), "left_anti")
          .select(F.col("a.vec_id")).count())

    t("anti-join alone (persisted assignment)", anti_only)
    kmp.unpersist()

    # ---------------- minhash decomposition ----------------
    print("== docs_minhash_candidates phases ==")
    from transilien_api_etl_spark.functions.text import (
        portable_token_hash,
        shingles,
        tokenize,
    )

    d = load_table(spark, SF_DIR, "documents").withColumn(
        "_toks", tokenize(F.col("text")))
    dw = widen_small_scan(spark, d)
    tok = dw.select(F.col("doc_id").alias("id"),
                    F.explode(F.array_distinct(
                        shingles(F.col("_toks"), 3))).alias("tok"))
    sig_aggs = [
        F.min(portable_token_hash(
            F.concat(F.lit(f"{s}:"), F.col("tok")))).alias(f"h{s}")
        for s in range(16)
    ]

    t("signature stage alone (tok+groupBy agg)",
      lambda: tok.groupBy("id").agg(*sig_aggs).count())

    fn = REGISTRY["docs_minhash_candidates"].fn
    t("full minhash", lambda: fn(spark, SF_DIR).count())

    spark.stop()


if __name__ == "__main__":
    main()
