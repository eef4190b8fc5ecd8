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
    """codes[i] = clamp(round((x-mn)/(mx-mn)·255), 0, 255) as array<int>
    (stored form would pack to 1 byte; int keeps the arithmetic transparent
    for the oracle). A constant dimension (mx == mn) codes to 0 instead of
    0/0 NaN — the oracle carries the same CASE guard. The clamp matters
    for ASYMMETRIC ingest: stats come from one corpus but the encoder is
    applied to later-arriving rows too, and an out-of-range value would
    otherwise code outside the byte range and silently wrap in a packed
    store. In-range data is untouched, so oracle parity is unaffected."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    # Clamp on the DOUBLE, cast after: casting first turned the very
    # out-of-range values the clamp exists for (and NaN dims) into an
    # ANSI CAST_OVERFLOW job-kill instead of a clamped byte. Verified on
    # this build: ±1e14 → 255/0, NaN → 255 (Spark orders NaN above every
    # double, so greatest(0,NaN)=NaN, least(255,NaN)=255 — saturates, no
    # abort; the Arrow twin's np.clip propagates NaN instead — both
    # non-fatal, and the bit-parity contract is for finite inputs).
    # In-range codes are identical to the pre-fix expression.
    return F.transform(
        F.col(col),
        lambda x, i: F.when(F.get(mx, i) == F.get(mn, i), F.lit(0)).otherwise(
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.round(
                        (x.cast("double") - F.get(mn, i))
                        / (F.get(mx, i) - F.get(mn, i))
                        * 255
                    ),
                ),
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


def sq8_cosine_arrow(
    emb: DataFrame,
    mins: list[float],
    maxs: list[float],
    qvec: list[float],
    qnorm: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk_prefilter: int | None = None,
    topk_round_dp: int = 8,
    keep_vec: bool = False,
) -> DataFrame:
    """Encode+dequant+cosine as ONE Arrow-batched numpy kernel — the
    vectorized quantized scan. Returns (id_col, cos_q8) with cos_q8
    UNROUNDED; callers apply F.round JVM-side (numpy's round is
    half-even, Spark/DuckDB round is decimal half-up — rounding on the
    JVM keeps the oracle contract).

    Delegates the order-sensitive accumulation loop to
    functions/vectors.cosine_scores_arrow (the single shared copy of the
    bit-parity fold) and contributes only the per-dimension SQ8 step:
    code = clamp(floor(v) + [frac(v) ≥ 0.5], 0, 255) where
    v = ((x-mn)/(mx-mn))*255. NOT floor(v+0.5): for v just under 0.5
    (e.g. the largest double < 0.5) v+0.5 lands exactly halfway and
    ties-to-even rounds the SUM up to 1.0, so floor(v+0.5)=1 while
    decimal HALF_UP (Spark F.round / the oracle) gives 0. frac = v -
    floor(v) is an exact double for v ≥ 0 (the integer part's bits
    subtract away losslessly), so the ≥ 0.5 comparison reproduces
    HALF_UP bit-exactly; the clamp mirrors sq8_code_expr (ties at
    negative v round differently pre-clamp but identically post-clamp).
    Dequant mn + (code*(mx-mn))/255; constant dimensions (mx==mn) code
    to 0 and dequant to mn, matching sq8_code_expr's CASE guard. Every
    op is the same sequential IEEE arithmetic as the column-expression
    kernel, so results are IDENTICAL bits (verified EXACT on 1 M×64 and
    property-tested in tests/test_arrow_kernel_parity.py).

    Measured on this box at 1 M×64 (local[32], warm cache): 0.83 s vs
    4.31 s for the pure-JVM HOF kernel — the int8 round/unpack plus two
    folds per row is where numpy's contiguous-buffer arithmetic wins.
    Scale posture unchanged: map-only, no shuffle, model state is 3×dim
    doubles shipped in the task closure; Arrow batches stream — nothing
    driver-side."""
    import numpy as np

    from transilien_api_etl_spark.functions.vectors import cosine_scores_arrow

    mn_arr = np.asarray(mins, dtype=np.float64)
    mx_arr = np.asarray(maxs, dtype=np.float64)

    def dequant(col, d):
        mn_d, mx_d = mn_arr[d], mx_arr[d]
        if mx_d == mn_d:
            code = np.zeros(len(col))
        else:
            v = ((col - mn_d) / (mx_d - mn_d)) * 255.0
            fv = np.floor(v)
            code = np.clip(fv + (v - fv >= 0.5), 0.0, 255.0)
        return mn_d + (code * (mx_d - mn_d)) / 255.0

    return cosine_scores_arrow(
        emb,
        qvec,
        qnorm,
        id_col=id_col,
        vec_col=vec_col,
        out_col="cos_q8",
        topk_prefilter=topk_prefilter,
        topk_round_dp=topk_round_dp,
        keep_vec=keep_vec,
        dim_transform=dequant,
    )
