#!/usr/bin/env python
"""A/B: exact cosine kNN over an UNPACKED flat-column embedding layout
(round 10, follow-up to scripts/knn_floor_probe.py).

The round-10 floor probe decomposed knn_cosine_top10's 1 M x 64 wall as
JVM list-scan 0.21 s + Arrow IPC 0.32 s + numpy kernel 0.08 s, i.e. the
marginal cost (slope ratio 4.0 vs DuckDB) is dominated by the Python
transfer tax plus Spark's list-type decode — NOT by arithmetic. Three
alternatives were rejected (HOF fold 1.41 s, Arrow batch-size sweeps
neutral-to-worse, element_at-unrolled codegen 2.17 s: 128 LIST accesses
per row). The one shape not yet measured keeps the kernel entirely in
whole-stage codegen with ZERO list accesses: unpack the embedding to 64
scalar FLOAT columns at rest (e_00..e_63) and evaluate

    cos = (q0*e_00 + ... + q63*e_63) / (qn * sqrt(e_00^2 + ... ))

as one codegen expression. Left-associative `+` reproduces the
sequential fold of functions/vectors.dot bit-for-bit (acc starts 0.0,
0.0+x0==x0), so the oracle hash contract is unchanged. A second variant
additionally reads a norm column precomputed at rest (the layout an ANN
index would ship anyway).

This is a LAYOUT question, same genus as the bucketed q3/q5 path: at
100 TB you choose the at-rest layout; the probe measures whether the
unpacked layout beats the list layout on the scan-heavy exact-kNN path.
For fairness the DuckDB side is also timed on BOTH layouts (hoisted
query vector, per the round-10 symmetric protocol).

Usage: python scripts/knn_flat_layout_ab.py   (one JSON line; one-time
scale-cache + flat-twin materialization, then ~2 min of timing).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from transilien_api_etl_spark import plans  # noqa: E402,F401
from transilien_api_etl_spark.io import cached_query_embedding  # noqa: E402
from transilien_api_etl_spark.plans.registry import REGISTRY  # noqa: E402
from transilien_api_etl_spark.scale import materialize_scale  # noqa: E402
from transilien_api_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
REPS = 5


def ensure_flat_twin(spark, src_dir: str) -> str:
    """Write vec_id, e_00..e_63 (float at rest, half the bytes of double)
    plus the precomputed L2 norm, next to the list-layout cache."""
    out = os.path.join(src_dir, "embeddings_flat.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    e = F.col("embedding")
    cols = [F.col("vec_id")] + [
        e[i].alias(f"e_{i:02d}") for i in range(DIM)
    ]
    # norm in the SAME sequential order as functions/vectors.l2_norm
    sq = e[0].cast("double") * e[0].cast("double")
    for i in range(1, DIM):
        sq = sq + e[i].cast("double") * e[i].cast("double")
    cols.append(F.sqrt(sq).alias("l2_norm"))
    emb.select(*cols).write.mode("overwrite").parquet(out)
    return out


def flat_plan(spark, flat_path: str, qvec, qn: float, with_norm: bool):
    df = spark.read.parquet(flat_path).filter(F.col("vec_id") != 0)
    dot = F.lit(float(qvec[0])) * F.col("e_00").cast("double")
    for i in range(1, DIM):
        dot = dot + F.lit(float(qvec[i])) * F.col(f"e_{i:02d}").cast("double")
    if with_norm:
        norm = F.col("l2_norm")
    else:
        sq = F.col("e_00").cast("double") * F.col("e_00").cast("double")
        for i in range(1, DIM):
            c = F.col(f"e_{i:02d}").cast("double")
            sq = sq + c * c
        norm = F.sqrt(sq)
    return (
        df.select(
            "vec_id", F.round(dot / (F.lit(qn) * norm), 8).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def time_df(make_df, reps: int = REPS) -> list[float]:
    make_df().count()  # untimed warm
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        make_df().count()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    spark = build_session(app_name="knn-flat-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = bench.SCALE_DIR
    materialize_scale(spark, SF_DIR, d1)
    flat = ensure_flat_twin(spark, d1)

    qvec = cached_query_embedding(spark, d1, vec_id=0)
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn**0.5

    # correctness first: both flat variants must equal the registered plan
    base = [tuple(r) for r in REGISTRY["knn_cosine_top10"].fn(spark, d1).collect()]
    for with_norm in (False, True):
        got = [tuple(r) for r in flat_plan(spark, flat, qvec, qn, with_norm).collect()]
        assert got == base, (with_norm, got[:3], base[:3])

    res = {"metric": "knn_flat_layout_ab", "sf_dir": SF_DIR, "queries": {}}
    res["queries"]["list_arrow_current"] = time_df(
        lambda: REGISTRY["knn_cosine_top10"].fn(spark, d1)
    )
    res["queries"]["flat_codegen"] = time_df(
        lambda: flat_plan(spark, flat, qvec, qn, with_norm=False)
    )
    res["queries"]["flat_codegen_stored_norm"] = time_df(
        lambda: flat_plan(spark, flat, qvec, qn, with_norm=True)
    )

    # DuckDB on both layouts, query vector hoisted (symmetric protocol)
    con = bench._duck_connect(d1)
    sql_list = bench._hoist_qvec(
        "knn_cosine_top10", REGISTRY["knn_cosine_top10"].oracle
    )
    con.execute(f"CREATE VIEW embeddings_flat AS SELECT * FROM read_parquet('{flat}/*.parquet')")
    # Strict symmetry (ADVICE r10): the Spark flat variant carries the
    # precomputed scalar query norm, so the DuckDB flat variant must not
    # recompute sqrt(q·q) inside every timed rep — hoist it into the
    # untimed q_vec temp table alongside the vector itself.
    con.execute("ALTER TABLE q_vec ADD COLUMN qn DOUBLE")
    con.execute("UPDATE q_vec SET qn = sqrt(list_inner_product(qv, qv))")
    dot_terms = " + ".join(f"q.qv[{i + 1}] * e.e_{i:02d}::DOUBLE" for i in range(DIM))
    sq_terms = " + ".join(f"e.e_{i:02d}::DOUBLE * e.e_{i:02d}::DOUBLE" for i in range(DIM))
    sql_flat = f"""
SELECT e.vec_id, round(({dot_terms}) / (q.qn * sqrt({sq_terms})), 8) AS cos_sim
FROM embeddings_flat e, q_vec q WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10"""
    for name, sql in (("duckdb_list", sql_list), ("duckdb_flat", sql_flat)):
        con.execute(sql).fetchall()
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            walls.append(round(time.perf_counter() - t0, 4))
        res["queries"][name] = walls
    con.close()

    res["medians"] = {
        k: round(statistics.median(v), 4) for k, v in res["queries"].items()
    }
    m = res["medians"]
    res["ratio_vs_duck_list"] = {
        k: round(m[k] / m["duckdb_list"], 3)
        for k in ("list_arrow_current", "flat_codegen", "flat_codegen_stored_norm")
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
