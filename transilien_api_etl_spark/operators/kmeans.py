"""Fixed-iteration Lloyd k-means over an embedding column (SemDeDup stage 1).

Semantic dedup (Abbas et al., "SemDeDup", 2023) prunes near-duplicate
training examples by (1) clustering embeddings with k-means and (2)
comparing pairs only WITHIN a cluster — turning an O(n²) all-pairs cosine
into O(Σ cluster_size²). This module is stage 1; the within-cluster prune
is composed in ``plans/semdedup_q.py``.

Spark-first shape: the per-row work is a JVM-side fold over a LITERAL
centroid array (no join, no shuffle, map-only — the assignment stage is
embarrassingly parallel at 100 TB); the only shuffle per iteration is the
k×dim centroid re-average, whose result (k·dim rows, a few KB) is the one
legitimately driver-held piece of state — exactly how Spark MLlib's own
KMeans treats centroids. Determinism contract for cross-engine oracles:
init = the k vectors with smallest id (cid in id order), squared distances
rounded to 6 decimals before argmin with cid as tie-break, centroid means
rounded to 6 decimals each update. All arithmetic is sequential
left-to-right double folds, matching DuckDB's ``list_inner_product``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.vectors import (
    dot,
    flatten_checked,
    round_half_up,
)

ROUND_DP = 6

# Above this k the literal-centroid expression tree (k structs × dim literal
# doubles per row) stops being the right physical plan: analysis/codegen cost
# grows with k·dim and the fold evaluates k·dim multiplies per row
# interpreter-side. The Arrow path batches the same argmin as one
# (batch × dim) @ (dim × k) matmul. Semantics are preserved (d² rounded to
# ROUND_DP, lowest-cid tie-break — np.argmin returns the FIRST minimum);
# only the float SUMMATION ORDER differs (pairwise vs sequential), so the
# cross-engine bit-parity contract is only claimed for k ≤ this bound —
# which covers every driver SF (the registered plans derive k=8 there).
ARROW_K_MIN = 17


def _assign_col(
    centroids: list[tuple[int, list[float]]], vv_name: str, v_name: str
) -> Column:
    """min-by-(dist², cid) over a literal centroid list, as ONE SQL string.

    dist²(v,c) = v·v − 2·v·c + c·c ; v·v arrives precomputed (once per row,
    not once per centroid), c·c folds driver-side in the same sequential
    double arithmetic as the oracle's ``list_inner_product(c.v, c.v)``.

    String-form (round 11, the pq_codes_col lesson from operators/pq.py):
    the previous Column-object form built k×(dim+2) literal Columns plus a
    ``dot`` fold per centroid through py4j — measured ~0.46 s to BUILD
    (+ ~0.04 s to analyze) at k=8×64-dim, paid once per Lloyd iteration
    plus once for the final assignment (~1.4 s of driver-side expression
    construction per registered kmeans query). This form builds in ~1 ms
    and analyzes in ~0.06 s (warmed 5-rep medians, BASELINE.md round-11
    session 5; embeddings_kmeans sf0.1 wall 1.99→0.92 s with the widen
    landing together). The inner product unrolls as the explicit
    left-to-right fold
    ``((0.0 + v[0]·c0) + v[1]·c1)…`` — the identical summation order to
    the old ``aggregate(zip_with(...))`` fold (value-parity verified at
    sf0.1: 0 differing rows; the driver's oracle MATCH re-proves it end
    to end at every SF). transform-over-literal-array keeps evaluation a
    k-iteration loop — no Janino unroll blowup (the pq kernel A/B/C
    note). Out-of-contract ragged rows degrade the same way (``get``
    returns NULL out of bounds, poisoning d² to NULL like the zip_with
    pad did), except rows LONGER than the centroid dim, which the old
    form NULL-poisoned and this form scores on the first ``dim``
    elements — outside the uniform-length data contract either way.
    """
    dim = len(centroids[0][1])
    entries = []
    for cid, vec in centroids:
        cc = 0.0
        for x in vec:
            cc += float(x) * float(x)
        fields = [f"'cid', {int(cid)}", f"'cc', {float(cc)!r}D"]
        fields += [f"'c{d}', {float(x)!r}D" for d, x in enumerate(vec)]
        entries.append(f"named_struct({', '.join(fields)})")
    cent_arr = f"array({', '.join(entries)})"
    ip = "0.0D"
    for d in range(dim):
        ip = f"({ip} + (CAST(get({v_name}, {d}) AS DOUBLE) * c.c{d}))"
    d2 = f"(({vv_name} - (2.0D * {ip})) + c.cc)"
    return F.expr(
        f"array_min(transform({cent_arr}, "
        f"c -> named_struct('d', round({d2}, {ROUND_DP}), 'cid', c.cid)))"
    )


def _assign_arrow_df(
    df: DataFrame, centroids: list[tuple[int, list[float]]], id_col: str
) -> DataFrame:
    """Large-k assignment: one matmul per Arrow batch instead of a k-entry
    literal expression tree. Input must be ``(id_col, v)`` with ``v`` a
    uniform array<double>; output is ``(id_col, v, cluster, d2)`` — the
    same shape :func:`kmeans_assign`'s JVM branch produces, with ``v``
    passed through the kernel so downstream per-cluster work (the SemDeDup
    prune) needs no join back to the corpus."""

    def assign(batches):
        import numpy as np
        import pyarrow as pa

        c_mat = np.asarray([vec for _, vec in centroids], dtype=np.float64)
        cids = np.asarray([cid for cid, _ in centroids], dtype=np.int32)
        cc = (c_mat * c_mat).sum(axis=1)
        dim = c_mat.shape[1]
        for batch in batches:
            vid = batch.column(0)
            vecs = batch.column(1)
            x = flatten_checked(vecs, dim, "v")
            vv = (x * x).sum(axis=1)
            d2 = round_half_up(
                vv[:, None] - 2.0 * (x @ c_mat.T) + cc[None, :], ROUND_DP
            )
            idx = np.argmin(d2, axis=1)  # first minimum = lowest cid tie-break
            yield pa.RecordBatch.from_arrays(
                [
                    vid,
                    vecs,
                    pa.array(cids[idx]),
                    pa.array(d2[np.arange(len(idx)), idx]),
                ],
                [id_col, "v", "cluster", "d2"],
            )

    return df.select(id_col, "v").mapInArrow(
        assign, f"{id_col} long, v array<double>, cluster int, d2 double"
    )


def _normalize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("vv", dot(F.col("v"), F.col("v")))


def kmeans_fit(
    emb: DataFrame, *, id_col: str, vec_col: str, k: int, iterations: int,
    n_rows: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Run ``iterations`` Lloyd steps and return the FINAL centroids —
    the driver-held model, e.g. as a PQ codebook (operators/pq.py).
    ``n_rows``, when the caller knows it, lets the widen guard skip the
    round-robin exchange on tiny inputs (io.WIDEN_MIN_ROWS)."""
    df = _normalize(emb, id_col, vec_col)
    # Single-row-group driver SFs plan ONE input split: widen so the
    # assignment/update map work uses every core instead of one task
    # (io.widen_small_scan — guarded no-op at scale, measured round 11;
    # size-gated round 12: at <1e5 rows the exchange costs more than the
    # single-task work).
    from transilien_api_etl_spark.io import widen_small_scan

    df = widen_small_scan(emb.sparkSession, df, n_rows)
    # Cache the normalized vectors across Lloyd iterations (the MLlib
    # pattern): every iteration re-reads df; without this each one re-scans
    # parquet and re-folds v·v. MEMORY_AND_DISK so a 100 TB input degrades
    # to spill, never OOM. Released before returning — the final returned
    # plan recomputes from the scan, callers cache if they iterate further.
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)

    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(id_col, "v")
        .collect()  # k rows of driver-held model state, by design
    )
    centroids = [(cid, list(r["v"])) for cid, r in enumerate(init)]

    for _ in range(iterations):
        if k >= ARROW_K_MIN:
            assigned = _assign_arrow_df(df, centroids, id_col).select(
                "cluster", F.posexplode("v").alias("d", "val")
            )
        else:
            best = _assign_col(centroids, "vv", "v")
            # NB: materialize the struct via withColumn before extracting
            # fields — extracting from the raw expression alongside a
            # multi-alias generator (posexplode) in one select loses the
            # struct field names in analysis.
            assigned = df.withColumn("best", best).select(
                F.col("best.cid").alias("cluster"),
                F.posexplode("v").alias("d", "val"),
            )
        rows = (
            assigned.groupBy("cluster", "d")
            .agg(F.round(F.avg("val"), ROUND_DP).alias("val"))
            .collect()  # k·dim rows — the centroid model update
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cluster"], {})[r["d"]] = r["val"]
        centroids = [
            (cid, [dims[d] for d in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]

    df.unpersist()
    return centroids


def kmeans_assign(
    emb: DataFrame, *, id_col: str, vec_col: str, k: int, iterations: int,
    n_rows: int | None = None,
) -> DataFrame:
    """Run ``iterations`` Lloyd steps, return (id, cluster, d2) assignments.

    ``emb`` needs an integer id column and an array<numeric> vector column of
    uniform length. Empty clusters are dropped (both here and in the SQL
    oracle — the same rows vanish from the update group-by on both engines).
    """
    df, _ = kmeans_assign_model(
        emb, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations,
        n_rows=n_rows,
    )
    return df


def kmeans_assign_model(
    emb: DataFrame, *, id_col: str, vec_col: str, k: int, iterations: int,
    n_rows: int | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """:func:`kmeans_assign` plus the fitted centroids — for consumers that
    need the model's shape (e.g. the SemDeDup prune derives the vector dim
    for its codegen-able pair predicate from ``centroids[0]``) without a
    second fit."""
    centroids = kmeans_fit(
        emb, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations,
        n_rows=n_rows,
    )
    from transilien_api_etl_spark.io import widen_small_scan

    df = widen_small_scan(emb.sparkSession, _normalize(emb, id_col, vec_col), n_rows)
    if k >= ARROW_K_MIN:
        return _assign_arrow_df(df, centroids, id_col).select(
            F.col(id_col), F.col("v"), F.col("cluster"), F.col("d2")
        ), centroids
    best = _assign_col(centroids, "vv", "v")
    return df.withColumn("best", best).select(
        F.col(id_col),
        F.col("v"),
        F.col("best.cid").alias("cluster"),
        F.col("best.d").alias("d2"),
    ), centroids


def kmeans_oracle_cte(
    k: int | str,
    iterations: int,
    round_dp: int = ROUND_DP,
    where: str = "",
) -> str:
    """The DuckDB CTE chain computing the identical assignment.

    Unrolled per iteration (recursive CTEs cannot re-aggregate per step —
    same honesty argument as the PageRank oracle). Exposes the final
    assignment as CTE ``af(vec_id, v, cluster, d2)``.

    ``k`` may be an SQL expression (e.g. a scalar subquery over CTE ``e``
    mirroring the derived-k schedule) — DuckDB accepts subqueries in
    LIMIT, which is what lets ONE static bench-twin oracle stay
    semantically identical to the Spark plan at every corpus size.
    ``where`` (a bare predicate, no ``WHERE``) filters the corpus before
    anything else — the reduced-corpus bench twins' knob.
    """

    def d2(vexpr: str, cexpr: str) -> str:
        return (
            f"round(list_inner_product({vexpr},{vexpr}) - "
            f"2*list_inner_product({vexpr},{cexpr}) + "
            f"list_inner_product({cexpr},{cexpr}), {round_dp})"
        )

    where_clause = f" WHERE {where}" if where else ""
    parts = [
        f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{where_clause}),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
       FROM e ORDER BY vec_id LIMIT {k})"""
    ]
    for i in range(1, iterations + 1):
        parts.append(f""",
a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {d2("e.v", "c.v")}, c.cid) AS rn
    FROM e, c{i - 1} c) t WHERE rn = 1),
u{i} AS (
  SELECT cid, d, round(avg(val), {round_dp}) AS val FROM (
    SELECT cid, unnest(v) AS val, generate_subscripts(v,1) AS d FROM a{i}) t
  GROUP BY cid, d),
c{i} AS (SELECT cid, list(val ORDER BY d) AS v FROM u{i} GROUP BY cid)""")
    parts.append(f""",
af AS (
  SELECT vec_id, v, cid AS cluster, dd AS d2 FROM (
    SELECT e.vec_id, e.v, c.cid, {d2("e.v", "c.v")} AS dd,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {d2("e.v", "c.v")}, c.cid) AS rn
    FROM e, c{iterations} c) t WHERE rn = 1)""")
    return "".join(parts)
