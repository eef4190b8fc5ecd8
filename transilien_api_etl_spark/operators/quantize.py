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
  indexed ``transform`` against the broadcast stats row.
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


def _scale(i: Column) -> Column:
    return F.get(F.col("maxs"), i) - F.get(F.col("mins"), i)


def sq8_code_expr(col: str = "embedding") -> Column:
    """codes[i] = round((x-mn)/(mx-mn)·255) as array<int> (stored form would
    pack to 1 byte; int keeps the arithmetic transparent for the oracle)."""
    return F.transform(
        F.col(col),
        lambda x, i: F.round(
            (x.cast("double") - F.get(F.col("mins"), i)) / _scale(i) * 255
        ).cast("int"),
    )


def sq8_dequant_expr(codes: str = "codes") -> Column:
    """Dequantized array<double> from a codes column, against the joined
    broadcast stats row."""
    return F.transform(
        F.col(codes),
        lambda c, i: F.get(F.col("mins"), i) + c.cast("double") * _scale(i) / 255,
    )


def sq8_encode(emb: DataFrame, stats: DataFrame, col: str = "embedding") -> DataFrame:
    """Attach ``codes`` (array<int>) to every row via the broadcast stats."""
    return emb.crossJoin(F.broadcast(stats)).withColumn("codes", sq8_code_expr(col))
