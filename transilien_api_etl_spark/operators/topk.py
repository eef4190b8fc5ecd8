"""Top-k operators (SURVEY.md §3 O2/O3/W1).

- ``topk_global`` → ``orderBy().limit(k)`` compiles to
  ``TakeOrderedAndProject``: each partition keeps a k-heap, the driver merges
  k·numPartitions rows — no global sort, safe at any scale.
- ``topk_per_group`` → ``row_number`` over a window + filter. One shuffle on
  the group key; at 100 TB the win is that the rank filter is applied
  map-side per partition after the shuffle — no second pass.

Always pass a tie-breaking unique column in ``order_by`` — without it the
k-th row is nondeterministic and oracle hashes diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_global(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    if rank_col in df.columns:
        # withColumn would silently OVERWRITE the caller's column and then
        # filter on the new ranks — original values unrecoverable.
        raise ValueError(
            f"column {rank_col!r} already exists on the input; pass a "
            "different rank_col"
        )
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
