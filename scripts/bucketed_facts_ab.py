#!/usr/bin/env python
"""A/B: bucketed-at-rest fact tables vs plain parquet for the two bench
queries whose only non-broadcast shuffle is the fact⋈fact join on the order
key (TPC-H q3/q5 shapes) — VERDICT r3 task 3.

Both facts are written once as 32-bucket managed tables bucketed+sorted on
the order key (sources/sinks.write_bucketed); the SAME registered plan
functions then run with lineitem/orders swapped for the bucketed tables
(load_table monkeypatch — dims still come from parquet). The bucketed read
satisfies the join's hashpartitioning requirement, so the exchange (and
with sortBy, the sort) vanish from the fact join.

Prints per-variant best-of-3 wall times and the Exchange node count in each
physical plan; run on the 60 M-row scale cache:

    python scripts/bucketed_facts_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transilien_api_etl_spark.io import load_table  # noqa: E402
from transilien_api_etl_spark.session import build_session, ensure_query_confs  # noqa: E402
from transilien_api_etl_spark.sources.sinks import write_bucketed  # noqa: E402

SCALE = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    "/root/repo/.scale_cache/do200xem500xev100xli100xor100",
)
N_BUCKETS = 32

spark = build_session(
    "bucketed-facts-ab",
    extra_conf={
        # v2: one-file-per-bucket layout (write_bucketed round-4 default)
        "spark.sql.warehouse.dir": "/tmp/bucketed_ab_wh_v2",
        # honor the at-rest sort so the merge join skips its Sort; safe
        # because the v2 layout guarantees one file per bucket
        "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    },
)
ensure_query_confs(spark)

for table, key, sort in (
    ("lineitem", "l_orderkey", "l_orderkey"),
    ("orders", "o_orderkey", "o_orderkey"),
):
    bname = f"{table}_bucketed"
    # ALWAYS drop + rewrite: the derby metastore (metastore_db/ in cwd)
    # outlives /tmp warehouses and write_bucketed layout changes, so a
    # tableExists guard would silently measure a stale layout — or crash
    # on a dangling table location after a reboot clears /tmp.
    spark.sql(f"DROP TABLE IF EXISTS {bname}")
    t0 = time.perf_counter()
    write_bucketed(
        load_table(spark, SCALE, table), bname, [key], N_BUCKETS, sort_cols=[sort]
    )
    print(f"# wrote {bname}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

import transilien_api_etl_spark.plans.relational as rel  # noqa: E402
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402

_orig_load = rel.load_table


def _bucketed_load(spark, sf_dir, name):
    if name in ("lineitem", "orders"):
        return spark.table(f"{name}_bucketed")
    return _orig_load(spark, sf_dir, name)


def n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def best_of(fn, reps=3) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn().count()
        best = min(best, time.perf_counter() - t0)
    return best, n


results = {}
for qname in ("q3_shipping_priority", "q5_local_supplier"):
    qfn = REGISTRY[qname].fn
    for variant, loader in (("plain", _orig_load), ("bucketed", _bucketed_load)):
        rel.load_table = loader
        try:
            df = qfn(spark, SCALE)
            ex = n_exchanges(df)
            wall, nrows = best_of(lambda: qfn(spark, SCALE))
            results[f"{qname}/{variant}"] = (wall, ex, nrows)
            print(
                f"{qname}/{variant}: {wall:.3f}s, {ex} Exchange nodes, {nrows} rows",
                flush=True,
            )
        finally:
            rel.load_table = _orig_load

print(results)
