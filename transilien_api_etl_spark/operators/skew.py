"""Skew mitigation recipes (SURVEY.md §5 'salting for skew').

AQE's skew-join splitting handles most cases at runtime; salting is the
declarative fallback for the two shapes AQE can't fix:

- a shuffle join whose hot key exceeds a single executor even after
  splitting (``salted_join``: big side salts deterministically, the other
  side replicates across the salt range — correctness is unconditional,
  cost is ×n_salt on the replicated side only);
- a high-cardinality aggregation with a handful of giant groups
  (``salted_agg``: two-phase — partial agg on (key, salt), final agg on
  key; only decomposable aggregates compose this way).

Salt derivation is ``pmod(xxhash64(row id cols), n)`` — deterministic, so
plans stay reproducible and tests exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, id_cols: list[str], n_salt: int) -> DataFrame:
    """Deterministic salt in [0, n_salt) from a stable hash of ``id_cols``.
    Raises if the input already carries the salt column (withColumn would
    silently overwrite the caller's data)."""
    if SALT_COL in df.columns:
        raise ValueError(
            f"with_salt: input already has a '{SALT_COL}' column; rename it first"
        )
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*id_cols), F.lit(n_salt)).cast("int"))


def replicate_over_salt(df: DataFrame, n_salt: int) -> DataFrame:
    """Cross the frame with the full salt range (the broadcast-side of a
    salted join): every row appears once per salt value."""
    return df.withColumn(SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    skewed_id_cols: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join where ``skewed`` has hot keys: join on (keys + salt) so a
    hot key's rows spread over ``n_salt`` shuffle partitions. ``other`` is
    replicated ×n_salt — keep it the smaller side.

    Only inner/left are supported: the replicated side appears once per
    salt, so right/full outer would emit each unmatched ``other`` row
    n_salt times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    left = with_salt(skewed, skewed_id_cols, n_salt)
    right = replicate_over_salt(other, n_salt)
    return left.join(right, [*on, SALT_COL], how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    id_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed groups.

    ``aggs`` maps output name → (partial_agg_expr, final_agg_expr_over_partial);
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n")), "v": (F.sum("value"), F.sum("v"))}``.
    Phase 1 groups by (keys, salt) — hot groups split n_salt ways; phase 2
    re-aggregates the (tiny) partial results by key alone.
    """
    partial = (
        with_salt(df, id_cols, n_salt)
        .groupBy(*keys, SALT_COL)
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )
