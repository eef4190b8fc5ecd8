#!/usr/bin/env python
"""Scaling-linearity probe for the LLM-ops bench rows (round 7 — the
scaling_curve.py treatment extended to the documents/embeddings queries,
which the relational probe deliberately skips).

Times the three round-7 bench additions plus two linear-baseline dedup
shapes at 1× (the bench cache: 1 M docs / 1 M vectors) and 2× (2 M / 2 M,
documents+embeddings-only cache) and reports wall-time growth per
doubling. What each SHOULD do by design:

- dedup_exact_docs, docs_segment_dedup: input-linear (scan + hash agg).
- docs_minhash_candidates: Θ(candidate pairs). The scale cache's replica
  groups are near-dup clusters whose SIZE doubles with the cache factor,
  so candidate pairs grow ~4× per doubling BY CONSTRUCTION — the probe
  reports pairs alongside time so growth can be read per-pair (a real
  corpus grows in #clusters, not cluster size; that shape IS the 1×→2×
  #docs axis a deployment sees, but this cache cannot produce it).
- knn_pq_adc_top10: input-linear (sampled train is size-capped; encode +
  ADC are map-only scans).
- semdedup_survivors: super-linear by schedule — k = n/4000 makes
  assignment Θ(n²/4000) (the measured-cheaper constant; see the
  schedule-choice note in plans/semdedup_q.py) and the prune Θ(n·4000).

Usage: python scripts/llm_ops_scaling.py  (one JSON line; one-time ~2 min
2× materialization, then ~15 min of timing, minhash dominates).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import (  # noqa: E402
    DEFAULT_FACTORS,
    materialize_scale,
    scale_dir_name,
)
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "dedup_exact_docs",
    "docs_segment_dedup",
    "docs_minhash_candidates",
    "knn_pq_adc_top10",
    "semdedup_survivors",
)
# Imported, not copied: if the graded bench's factors are retuned, the 1×
# baseline must follow or the probe stops being comparable to BENCH rows.
X1 = DEFAULT_FACTORS
X2 = {"documents": 400, "embeddings": 1000}  # 2 M docs / 2 M vectors


def time_queries(spark, data_dir: str) -> tuple[dict[str, float], dict[str, int]]:
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        rows[name] = REGISTRY[name].fn(spark, data_dir).count()  # warm, untimed
        warm = time.perf_counter() - t0
        reps = []
        for _ in range(2 if warm > 5.0 else 3):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, data_dir).count()
            reps.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(reps), 4)
        print(f"# {os.path.basename(data_dir)} {name}: {times[name]:.3f}s "
              f"of {[round(r, 3) for r in reps]} ({rows[name]} rows)",
              file=sys.stderr)
    return times, rows


def main() -> None:
    spark = build_session(app_name="llm-ops-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    d1 = os.path.join(REPO_DIR, ".scale_cache", scale_dir_name(X1))
    d2 = os.path.join(REPO_DIR, ".scale_cache", scale_dir_name(X2))
    rows1 = materialize_scale(spark, SF_DIR, d1, X1)
    rows2 = materialize_scale(spark, SF_DIR, d2, X2)
    print(f"# caches ready: 1x={rows1}, 2x={rows2}", file=sys.stderr)

    t1, n1 = time_queries(spark, d1)
    t2, n2 = time_queries(spark, d2)
    print(json.dumps({
        "metric": "llm_ops_scaling_2x",
        "rows_1x": {k: rows1[k] for k in ("documents", "embeddings")},
        "rows_2x": rows2,
        "t_1x": t1, "t_2x": t2,
        "out_rows_1x": n1, "out_rows_2x": n2,
        "growth_2x": {q: round(t2[q] / t1[q], 2) for q in QUERIES if t1[q] > 0},
        "out_growth_2x": {q: round(n2[q] / n1[q], 2) for q in QUERIES if n1[q]},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
