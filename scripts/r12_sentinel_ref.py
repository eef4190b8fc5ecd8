#!/usr/bin/env python
"""Measure the box-speed sentinel (bench.measure_sentinel) N times and
print per-workload medians — the numbers committed as
bench.SENTINEL_REF_S. Run on a calm box; re-run and re-commit when the
reference hardware changes."""
from __future__ import annotations

import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session(app_name="r12_sentinel_ref")
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for i in range(n):
        s = bench.measure_sentinel(spark)
        runs.append(s)
        print(f"run {i}: {s}")
    for k in ("spark_jvm", "spark_arrow", "duckdb"):
        print(f"median {k}: {statistics.median(r[k] for r in runs):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
