#!/usr/bin/env python
"""Sizing/health probe for the round-9 bench twins (VERDICT r8 task 1).

Times each registered reduced-corpus ``bench_oracle`` once in DuckDB
against the scale cache, so the committed bounds stay measured facts
(round-9 sizing record, sf0.1 cache = 1 M vectors, local[32] box):

- semdedup_survivors twin (128 k vectors, k=32, window-form kmeans CTE +
  norm-precomputed NOT EXISTS prune): 17.1 s — vs >60 s cap for the
  full-corpus chain; candidate sizes 34 k/48 k/64 k measured 4.4/5.0/7.1 s.
- knn_pq_adc_top10 twin (vec_id%mod sampled train, minjoin/materialized
  argmin): 6.1 s at 100 k vectors, 9.9 s at 200 k, 146-151 s at 500 k —
  the minjoin argmin is SUPERLINEAR in the corpus (2.5× rows → 15×
  wall), so the committed bound is 100 replicas = 200 k vectors (the
  smallest size keeping Spark's sampled-train + Arrow-encode scale path
  engaged). A 250-replica bound briefly shipped on a 9.9 s record that
  had actually been measured at 100 replicas; re-probing caught it.
  The window-form chain was interrupted at >200 s even at 200 k;
  min(struct) hash-agg measured 126 s (rejected); the min-join rewrite
  A/B'd value-identical at 200 k.

Box-state caveat (round 9): under host-level contention (load avg ~13
with no local process >3% CPU) the heavy oracles measured 2-3× their
quiet-box walls in one probe pass (semdedup 49 s, minhash 102 s) while
a PQ-at-200 k probe minutes later read its quiet-box 9.9 s — treat any
single probe reading against the cross-run bands in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import transilien_api_etl_spark.plans  # noqa: F401,E402 — populate REGISTRY
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import scale_dir_name  # noqa: E402

SCALE_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(REPO, ".scale_cache", scale_dir_name())
)
WATCHDOG_S = float(os.environ.get("PROBE_WATCHDOG_S", "180"))
TWINS = ("semdedup_survivors", "knn_pq_adc_top10", "docs_minhash_candidates")


def main() -> None:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_twin_probe_spill.tmp'")
    for t in ("embeddings", "documents"):
        p = os.path.join(SCALE_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    print(f"# scale dir: {SCALE_DIR}")
    for name in TWINS:
        sql = REGISTRY[name].bench_oracle
        timer = threading.Timer(WATCHDOG_S, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            rows = con.execute(sql).fetchall()
            print(f"{name}: {time.perf_counter() - t0:.1f}s, {len(rows)} rows")
        except duckdb.Error as e:
            print(
                f"{name}: INTERRUPTED/ERR after "
                f"{time.perf_counter() - t0:.1f}s: {e}"
            )
        finally:
            timer.cancel()


if __name__ == "__main__":
    main()
