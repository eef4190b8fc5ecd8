#!/usr/bin/env python
"""A/B probe (round 11, session 2): scan parallelism for the Arrow-kernel
kNN rows. RESULT: NEGATIVE — the hypothesis was wrong and the change was
NOT applied.

Hypothesis (guide §6.1 + §4.2): the scale cache writes each fact table as
32 small parquet files; leaf-file bin-packing (`maxPartitionBytes` +
`openCostInBytes`) might pack those into ~3 scan splits, leaving the
Python/numpy kNN kernels (whose single-thread cost for 1 M x 64 vectors
is ~1.6 s, measured standalone) on ~3 of the 32 cores. A
`spark.sql.files.minPartitionNum` floor at defaultParallelism would then
recover the idle cores without changing any result.

Measured refutation (2026-08-17, BASELINE.md "Round-11 session 2"):
`df.rdd.getNumPartitions()` on every scale-cache table is ALREADY 32
with the conf unset — the 32 written files each get their own split, so
the floor is a no-op; the paired per-rep quotients (floored_i/base_i,
the bench's own storm-proofing) read ~1.0 in calm windows (0.92-1.10),
and an earlier arm-at-a-time run that showed a 2x "win" had its baseline
arm contended by a concurrent pytest. Kept for the record and for re-use
if the cache layout ever changes.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import materialize_scale, scale_dir_name  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = os.path.join(REPO, ".scale_cache", scale_dir_name())
ROWS = ("knn_sq8_top10", "knn_cosine_top10", "knn_rerank_top10")
REPS = 5


def main() -> None:
    spark = build_session(app_name="knn-scan-parallelism-ab")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    rows = materialize_scale(spark, SF_DIR, SCALE_DIR)
    print(f"# scale cache ready in {time.perf_counter() - t0:.1f}s: {rows}")
    cores = spark.sparkContext.defaultParallelism

    # Per-rep PAIRED arms (the bench's own storm-proofing, applied to the
    # A/B): rep i runs baseline then floored back-to-back on the same box
    # moment; the per-rep quotient floored_i/baseline_i cancels the
    # degraded-host state that made arm-at-a-time readings swing 2-3x.
    def run_once(fn, floor) -> float:
        if floor is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", str(floor))
        t0 = time.perf_counter()
        fn(spark, SCALE_DIR).count()
        return round(time.perf_counter() - t0, 4)

    for name in ROWS:
        spec = REGISTRY[name]
        fn = spec.bench_fn or spec.fn
        spark.sparkContext.setJobDescription(f"{name} [paired A/B]")
        run_once(fn, None)  # warm (cache + JIT), untimed
        run_once(fn, cores)
        base, floored = [], []
        for _ in range(REPS):
            base.append(run_once(fn, None))
            floored.append(run_once(fn, cores))
        quots = [round(f / b, 3) for f, b in zip(floored, base)]
        print(
            f"{name:20s} base_med={statistics.median(base):.3f}s "
            f"floor_med={statistics.median(floored):.3f}s "
            f"quot_med={statistics.median(quots):.3f} quots={quots}\n"
            f"  base={base}\n  floor={floored}"
        )
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
