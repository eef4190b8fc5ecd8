#!/usr/bin/env python
"""A/B harness for the round-11 session-5 headline-wall work: times the
registered fn of the touched rows at sf0.1 (exactly what bench.py's
phase-1 "queries" map measures — warm run + N timed `count()` reps,
median reported), so the before/after walls in BASELINE.md are re-runnable
facts. Run once on the baseline tree (git stash) and once on the changed
tree; compare medians against the cross-run bands, not single readings
(±30-50% host jitter on sub-0.3 s walls — BASELINE.md round 9).

Usage: python scripts/headline_walls_ab.py [row ...]
Env:   WALLS_SF_DIR (default /root/testdata/sf0.1), WALLS_REPS (default 5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import transilien_api_etl_spark.plans  # noqa: F401,E402 — populate REGISTRY
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

ROWS = sys.argv[1:] or [
    "semdedup_survivors",
    "docs_minhash_candidates",
    "knn_pq_adc_top10",
    "embeddings_kmeans",
    "embeddings_pq_codes",
]
SF_DIR = os.environ.get("WALLS_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("WALLS_REPS", "5"))


def main() -> None:
    spark = build_session(app_name="headline-walls-ab")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# sf dir: {SF_DIR}, reps: {REPS}")
    for name in ROWS:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"walls-ab:{name}:warm")
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        warm = time.perf_counter() - t0
        reps: list[float] = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"walls-ab:{name}:rep{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            reps.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(reps):.3f}s "
            f"(warm {warm:.3f}s, rows={n}, "
            f"reps={[round(r, 3) for r in reps]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
