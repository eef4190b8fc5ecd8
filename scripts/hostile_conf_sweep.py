#!/usr/bin/env python
"""Conf-robustness gate: run the FULL registry against its DuckDB oracles
under a deliberately hostile externally-built session — the confs a
shared-cluster driver might hand us:

- ``spark.sql.ansi.enabled=false``      (engine default flipped)
- ``spark.sql.shuffle.partitions=200``  (the Spark default, 25× our cores)
- session timezone Pacific/Kiritimati   (UTC+14, no DST — maximally far
  from the pinned-UTC assumption)
- ``preferSortMergeJoin=true``, AQE OFF (both build_session choices undone)

``ensure_query_confs`` re-pins the parity-critical subset per query
(timezone, AQE, SMJ preference, Arrow, nanosAsLong); everything else must
be conf-independent by construction. Round-5 result: 193/193 value-equal.

Usage: cd /tmp && python /root/repo/scripts/hostile_conf_sweep.py
(~10 min at sf0.01; exit code 1 on any divergence.)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hostile-conf-sweep")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "Pacific/Kiritimati")
        .config("spark.sql.join.preferSortMergeJoin", "true")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import transilien_api_etl_spark.plans as p

    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    bad: list[tuple[str, str]] = []
    names = sys.argv[1:] or list(p.REGISTRY)
    for i, name in enumerate(names):
        spec = p.REGISTRY[name]
        try:
            got = spec.fn(spark, SF).toPandas()
            exp = con.execute(spec.oracle).df()
            g = got.reindex(sorted(got.columns), axis=1)
            e = exp.reindex(sorted(exp.columns), axis=1)
            if len(g) != len(e):
                bad.append((name, f"rows {len(g)} vs {len(e)}"))
                continue
            for c in g.columns:
                gv, ev = g[c], e[c]
                if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                    if not np.allclose(
                        gv.astype(float).fillna(-9e99),
                        ev.astype(float).fillna(-9e99),
                        rtol=0,
                        atol=1e-9,
                    ):
                        bad.append((name, f"col {c} values"))
                        break
                elif not (
                    gv.astype(str)
                    .reset_index(drop=True)
                    .equals(ev.astype(str).reset_index(drop=True))
                ):
                    bad.append((name, f"col {c} values"))
                    break
        except Exception as ex:  # noqa: BLE001 - report-and-continue sweep
            bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:120]}"))
        if (i + 1) % 40 == 0:
            print(f"progress {i + 1}/{len(names)}, bad so far {len(bad)}", flush=True)
    print(f"HOSTILE SWEEP: {len(names)} checked, {len(bad)} bad")
    for b in bad:
        print(b)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
