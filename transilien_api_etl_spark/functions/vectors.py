"""Vector similarity as pure column expressions (SURVEY.md §3 F8).

Higher-order functions (zip_with/aggregate) keep the dot product JVM-side —
no Python boundary, no UDF serialization. The fold is sequential
left-to-right in double precision, which matches DuckDB's list_inner_product
accumulation order, so oracle hashes agree to the last bit (rounded outputs
still recommended).

For 100 TB ANN, these exact kernels are the re-rank stage; candidate
generation goes through LSH bucketing (operators/similarity.py) so the
cross product never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine when each side's L2 norm is already a column.

    Join-shaped cosine work should precompute ``l2_norm`` per ROW before the
    join (n folds), not per PAIR after it (n·k folds): per-pair cost drops to
    a single dot fold. The final expression dot/(√Σa²·√Σb²) is bit-identical
    to :func:`cosine_similarity` when the norm columns come from
    :func:`l2_norm`, so DuckDB-oracle hash parity is preserved.
    """
    return dot(a, b) / (norm_a * norm_b)


def array_mean(a: Column) -> Column:
    return dot(a, F.transform(a, lambda _: F.lit(1.0))) / F.size(a)
