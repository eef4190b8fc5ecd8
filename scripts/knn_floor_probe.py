#!/usr/bin/env python
"""Floor-amortization probe for knn_cosine_top10 and
topk_orders_per_customer (round 10).

Context: restoring query-vector symmetry (ADVICE r9 — the DuckDB kNN
oracles' vec_id-0 lookup is now hoisted out of the timed reps, mirroring
Spark's untimed memo) revealed that the lookup was ~90% of the
knn_cosine denominator: DuckDB's pure-compute wall for the 2.5 M x 64
brute-force cosine top-10 is ~40 ms, far below Spark's ~0.3 s
single-job floor, so the graded ratio (~13x) measures the FLOOR, not
the plan. topk similarly hovers at ~1.7-1.9 on a ~1 s wall. This probe
measures how each ratio amortizes as its fact table doubles:
knn_cosine at 2x embeddings (5 M vectors, embeddings-only cache),
topk at the scaling-curve 2x relational cache (20 M orders) — Spark +
hoisted-oracle walls at both scales and the fitted marginal (slope)
ratio, the number a compute-dominated deployment actually pays.
(docs_token_stats / docs_word_freq_top20 were adjudicated the same way
in round 7: scripts/docs_floor_amortization.py, ratios 0.60 / 1.89 at
4 M docs — see BASELINE.md.)

Usage: python scripts/knn_floor_probe.py  (prints one JSON line;
one-time ~1 min 2x materialization, then ~2 min of timing).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import bench  # noqa: E402
from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import (  # noqa: E402
    materialize_scale,
    scale_dir_name,
)
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def spark_walls(spark, data_dir: str, query: str) -> list[float]:
    fn = REGISTRY[query].fn
    fn(spark, data_dir).count()  # untimed warm (cold cache + JIT + memo)
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, data_dir).count()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def duck_walls(data_dir: str, query: str) -> list[float]:
    con = bench._duck_connect(data_dir)  # q_vec hoist table built untimed
    sql = bench._hoist_qvec(query, REGISTRY[query].oracle)
    con.execute(sql).fetchall()  # untimed warm
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out.append(round(time.perf_counter() - t0, 4))
    con.close()
    return out


def main() -> None:
    spark = build_session(app_name="knn-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d1 = bench.SCALE_DIR  # the bench cache: 2.5 M vectors / 10 M orders
    d2_emb = os.path.join(
        REPO_DIR, ".scale_cache", scale_dir_name({"embeddings": 1000})
    )
    d2_rel = os.path.join(
        REPO_DIR,
        ".scale_cache",
        scale_dir_name({"lineitem": 200, "orders": 200, "events": 200}),
    )
    rows2 = materialize_scale(spark, SF_DIR, d2_emb, {"embeddings": 1000})
    rows2.update(
        materialize_scale(
            spark, SF_DIR, d2_rel,
            {"lineitem": 200, "orders": 200, "events": 200},
        )
    )

    out = {"metric": "knn_floor_probe", "rows_2x": rows2, "queries": {}}
    for query, d2 in (
        ("knn_cosine_top10", d2_emb),
        ("topk_orders_per_customer", d2_rel),
    ):
        s1, s2 = spark_walls(spark, d1, query), spark_walls(spark, d2, query)
        o1, o2 = duck_walls(d1, query), duck_walls(d2, query)
        sm1, sm2 = statistics.median(s1), statistics.median(s2)
        om1, om2 = statistics.median(o1), statistics.median(o2)
        # wall = C + m*n fit over the two scales; marginal = slope ratio.
        # BOTH slopes must be positive and outside rep noise for the
        # 2-point fit to mean anything (code-review round 10): a
        # constant-dominated Spark wall can jitter DOWN at 2x, and a
        # ~40 ms DuckDB delta within rep spread would make the quotient
        # arbitrary — report null and let the reader use the raw walls.
        ms, md = sm2 - sm1, om2 - om1
        noise_s = statistics.pstdev(s1 + s2)
        noise_d = statistics.pstdev(o1 + o2)
        slopes_ok = ms > max(0.0, noise_s / 2) and md > max(0.0, noise_d / 2)
        out["queries"][query] = {
            "spark_1x": round(sm1, 4),
            "spark_2x": round(sm2, 4),
            "duckdb_1x": round(om1, 4),
            "duckdb_2x": round(om2, 4),
            "spark_reps": {"1x": s1, "2x": s2},
            "duckdb_reps": {"1x": o1, "2x": o2},
            "ratio_1x": round(sm1 / om1, 3),
            "ratio_2x": round(sm2 / om2, 3),
            "marginal_ratio": round(ms / md, 3) if slopes_ok else None,
            "spark_fixed_est": round(sm1 - ms, 4) if slopes_ok else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
