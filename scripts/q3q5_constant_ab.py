"""A/B: does disabling AQE shrink the plain q3/q5 fixed constant? (r8 task 4)

BASELINE.md round-8 quantified that ~0.7-0.8 s of plain q3's 1.5 s wall at
60 M rows is a per-query constant (scheduling + codegen + plan rounds),
roughly half the graded numerator. These are fixed-shape 4-stage plans —
star joins whose strategy never changes at this scale — so AQE's runtime
re-optimization rounds (one per materialized shuffle stage) are pure
overhead IF they are measurable. This script interleaves AQE on/off reps
within one session so box drift hits both arms equally.

Usage: python scripts/q3q5_constant_ab.py [n_interleaved_rounds]
Requires the 60 M-row scale cache (bench.py materializes it).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from transilien_api_etl_spark import plans  # noqa: F401,E402
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import scale_dir_name  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(REPO, ".scale_cache", scale_dir_name())
)
QUERIES = ("q3_shipping_priority", "q5_local_supplier")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session()
    results: dict[str, dict[str, list[float]]] = {
        q: {"aqe_on": [], "aqe_off": []} for q in QUERIES
    }
    # warm both shapes under both settings (page cache + codegen cache)
    for q in QUERIES:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            REGISTRY[q].fn(spark, SCALE_DIR).count()
    for _ in range(rounds):
        for q in QUERIES:
            for aqe, arm in (("true", "aqe_on"), ("false", "aqe_off")):
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                t0 = time.perf_counter()
                REGISTRY[q].fn(spark, SCALE_DIR).count()
                results[q][arm].append(round(time.perf_counter() - t0, 4))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for q in QUERIES:
        on, off = results[q]["aqe_on"], results[q]["aqe_off"]
        print(
            f"{q}: aqe_on median {statistics.median(on):.3f}s {on} | "
            f"aqe_off median {statistics.median(off):.3f}s {off} | "
            f"delta {statistics.median(on) - statistics.median(off):+.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
