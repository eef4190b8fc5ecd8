#!/usr/bin/env python
"""Round-12 probe: split driver-side analysis/planning cost from execution
for the big sf0.1 headline walls (guide §1 / §7.3 — when a small-input query
is slow, suspect the driver). For each query: time (a) building the
DataFrame (plan construction, incl. any eager model fits), (b) forcing
analysis+physical planning WITHOUT running (queryExecution().executedPlan()),
and (c) the action on the already-planned frame."""
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
NAMES = sys.argv[1:] or [
    "knn_pq_adc_top10",
    "semdedup_survivors",
    "docs_minhash_candidates",
    "embeddings_kmeans",
    "embeddings_pq_codes",
]


def main():
    spark = build_session(app_name="r12_plan_vs_exec")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).count()

    for name in NAMES:
        fn = REGISTRY[name].fn
        fn(spark, SF_DIR).count()  # warm
        for rep in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            print(
                f"{name:28s} build={t1 - t0:6.3f}  plan={t2 - t1:6.3f}  "
                f"exec={t3 - t2:6.3f}  total={t3 - t0:6.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
