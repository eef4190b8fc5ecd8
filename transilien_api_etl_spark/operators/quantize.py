"""Scalar (int8) quantization of embedding columns — SURVEY.md §3 F8 scale
path (M6).

At 100 TB an embedding corpus is dominated by vector bytes: 64 float32 dims
= 256 B/row. Per-dimension min/max scalar quantization stores 1 byte/dim
(4× smaller, 8× vs DOUBLE), which is the standard first rung of the ANN
memory ladder (SQ8 in FAISS terms) before product quantization. Search
stays *asymmetric*: the query keeps full float precision and only the
corpus side is dequantized code→float, so recall loss is the quantization
error of one side only.

Everything here is pure column expressions (transform/zip_with/aggregate
higher-order functions) — JVM-side, codegen'd, no Python crossing:

- ``sq8_stats``  : per-dimension global [min, max] — posexplode + 64-key
  groupBy (map-side combinable: each task emits ≤ dim rows), folded into a
  single broadcastable row of dim-ordered ``mins``/``maxs`` arrays.
- ``sq8_encode`` : codes[i] = round((x[i]-mn[i])/(mx[i]-mn[i])·255) via an
  indexed ``transform`` against LITERAL stats arrays (driver-held model,
  see ``sq8_stats_model``) — map-only, join-free.
- ``sq8_dequant``: mn[i] + code[i]·(mx[i]-mn[i])/255, same shape.

The sequential left-fold of :func:`transilien_api_etl_spark.functions.
vectors.dot` matches DuckDB's ``list_reduce``/``list_inner_product``
accumulation order, so oracle hashes agree to the bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq8_stats(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """One-row DataFrame of per-dimension ``mins`` / ``maxs`` arrays.

    The n·dim posexplode never materializes beyond each scan task: the
    64-key partial aggregation collapses it map-side, so the shuffle moves
    O(tasks·dim) rows regardless of corpus size.
    """
    d = emb.select(F.posexplode(col).alias("d", "x"))
    s = d.groupBy("d").agg(
        F.min(F.col("x").cast("double")).alias("mn"),
        F.max(F.col("x").cast("double")).alias("mx"),
    )
    return s.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mn"))), lambda t: t["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mx"))), lambda t: t["mx"]
        ).alias("maxs"),
    )


def sq8_stats_model(emb: DataFrame, col: str = "embedding") -> tuple[list[float], list[float]]:
    """Collect the per-dimension stats as driver-held lists (2×dim doubles —
    the same legitimately-driver-held 'small model' contract as k-means
    centroids). Downstream expressions embed them as LITERAL arrays: codegen
    reads primitive constants instead of per-element lookups into a
    broadcast-joined row's boxed arrays, which measured ~4 s slower per
    1 M × 64 encode+score pass."""
    r = sq8_stats(emb, col).first()
    return [float(x) for x in r["mins"]], [float(x) for x in r["maxs"]]


def _lit_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def sq8_code_expr(mins: list[float], maxs: list[float], col: str = "embedding") -> Column:
    """codes[i] = round((x-mn)/(mx-mn)·255) as array<int> (stored form would
    pack to 1 byte; int keeps the arithmetic transparent for the oracle).
    A constant dimension (mx == mn) codes to 0 instead of 0/0 NaN — the
    oracle carries the same CASE guard."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    return F.transform(
        F.col(col),
        lambda x, i: F.when(F.get(mx, i) == F.get(mn, i), F.lit(0)).otherwise(
            F.round(
                (x.cast("double") - F.get(mn, i)) / (F.get(mx, i) - F.get(mn, i)) * 255
            ).cast("int")
        ),
    )


def sq8_dequant_expr(mins: list[float], maxs: list[float], codes: str = "codes") -> Column:
    """Dequantized array<double> from a codes column, against literal stats.
    mn + 0·(mx-mn)/255 reduces to mn for constant dimensions, so no guard
    is needed here — but it is kept explicit in the oracle for symmetry."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    return F.transform(
        F.col(codes),
        lambda c, i: F.get(mn, i) + c.cast("double") * (F.get(mx, i) - F.get(mn, i)) / 255,
    )


def sq8_encode(
    emb: DataFrame, mins: list[float], maxs: list[float], col: str = "embedding"
) -> DataFrame:
    """Attach ``codes`` (array<int>) to every row — map-only, no join."""
    return emb.withColumn("codes", sq8_code_expr(mins, maxs, col))

