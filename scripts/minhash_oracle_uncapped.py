"""Measure the minhash DuckDB oracle UNCAPPED at bench scale (VERDICT r7
task 3): the graded bench records it as a 60 s watchdog lower bound, and
of the three capped oracles it is the only one that is NOT asymptotically
different from the Spark plan (same banded algorithm, single process) —
so the asterisked "≤1.16" ratio hides a measurable real number. This
script runs the full-corpus (1 M-doc) oracle and the 500 k-doc bench-twin
oracle once each with only a last-resort 1-hour watchdog, and prints the
real walls for BASELINE.md.

Usage: python scripts/minhash_oracle_uncapped.py [scale_dir]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

import transilien_api_etl_spark.plans  # noqa: F401 — populate REGISTRY
from transilien_api_etl_spark.plans.registry import REGISTRY
from transilien_api_etl_spark.scale import scale_dir_name

SCALE_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(REPO, ".scale_cache", scale_dir_name())
)
WATCHDOG_S = 3600.0

spec = REGISTRY["docs_minhash_candidates"]
con = duckdb.connect()
# Same spill-directory pin as bench.py / drive_contract.py: an in-memory
# connection spills to ./.tmp of the CWD by default, and an hour-long 1 M-doc
# oracle can stage multi-GB temps — keep them out of the repo (ADVICE r8).
con.execute("SET temp_directory='/tmp/duckdb_minhash_spill.tmp'")
docs = os.path.join(SCALE_DIR, "documents.parquet")
if os.path.isdir(docs):
    docs = os.path.join(docs, "*.parquet")
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]

out = {"scale_dir": SCALE_DIR, "n_docs": n_docs, "watchdog_s": WATCHDOG_S}
for label, sql in (("full_corpus", spec.oracle), ("bench_twin_500k", spec.bench_oracle)):
    timer = threading.Timer(WATCHDOG_S, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        n_pairs = len(con.execute(sql).fetchall())
        wall = time.perf_counter() - t0
        out[label] = {"wall_s": round(wall, 1), "pairs": n_pairs}
        print(f"# {label}: {wall:.1f}s, {n_pairs} pairs", file=sys.stderr)
    except duckdb.Error as e:
        out[label] = {"wall_s": None, "interrupted_after_s": WATCHDOG_S, "err": str(e)[:80]}
        print(f"# {label}: interrupted at {WATCHDOG_S:.0f}s", file=sys.stderr)
    finally:
        timer.cancel()
print(json.dumps(out))
