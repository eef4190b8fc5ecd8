#!/usr/bin/env python
"""Headline benchmark — the driver's per-round performance probe.

Runs every ``bench=True`` query from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing discipline: one shared SparkSession (a cluster user amortizes JVM
startup the same way), one untimed warm-up query to JIT the codegen paths,
then each query timed end-to-end including its action (count of the
materialized result — collect would measure Arrow transfer, which is the
caller's cost, not the plan's).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transilien_api_etl_spark import plans  # noqa: E402
from transilien_api_etl_spark.plans.registry import bench_queries  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    # warm-up: run the cheapest query once, untimed (JVM/codegen/Arrow spin-up)
    warm = specs.get("q1_pricing_summary") or next(iter(specs.values()))
    warm.fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        best, n = float("inf"), 0
        for _ in range(2):  # best-of-2: measures the plan, not JIT/GC noise
            t0 = time.perf_counter()
            n = specs[name].fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
