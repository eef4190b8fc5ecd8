#!/usr/bin/env python
"""Dump `.explain("formatted")` for the round-12 touched queries into
plans/r12/<query>_{before,after}.txt.

Usage: python scripts/r12_dump_plans.py <repo_root> <suffix>
  repo_root — the tree whose registry to import (the round-11 worktree for
  the *_before.txt dumps, this repo for *_after.txt)
  suffix    — "before" or "after"

The dump reads sf0.001 (driver-SF shape, same as plans/r11) and, for the
bench twins, additionally dumps the twin plan where the twin differs from
the registered fn.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = sys.argv[1]
SUFFIX = sys.argv[2]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
sys.path.insert(0, ROOT)

from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.001"

TOUCHED = [
    "docs_minhash_candidates",
    "semdedup_survivors",
    "embeddings_kmeans",
    "embeddings_pq_codes",
    "knn_pq_adc_top10",
]
# rows whose BENCH TWIN changed this round (plan of bench_fn at sf0.001)
TWIN_TOUCHED = [
    "knn_sq8_top10",
    "knn_rerank_top10",
    "docs_word_freq_top20",
    "events_sessionize",
    "asof_join_purchase_click",
    "window_rolling_avg",
    "docs_segment_dedup",
    "pretrain_corpus_report",
]


def dump(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session(app_name=f"r12_dump_plans_{SUFFIX}")
    spark.sparkContext.setLogLevel("ERROR")
    header = (
        f"# round-12 {SUFFIX} (tree: {ROOT})\n# data: {SF}\n\n"
    )
    for name in TOUCHED:
        df = REGISTRY[name].fn(spark, SF)
        path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(header + dump(df) + "\n")
        print(f"wrote {path}")
    for name in TWIN_TOUCHED:
        spec = REGISTRY[name]
        fn = spec.bench_fn or spec.fn
        df = fn(spark, SF)
        path = os.path.join(OUT_DIR, f"{name}_twin_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(header + dump(df) + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
