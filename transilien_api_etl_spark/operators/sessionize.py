"""Gap-based sessionization (SURVEY.md §3 T4 batch oracle).

lag-gap + running-sum recipe: a new session starts when the gap to the
previous event (per user) exceeds ``gap_seconds``. Batch-equivalent to
Structured Streaming's ``session_window`` (verified in tests), so streaming
results can be oracle-checked against this plan.

One shuffle on the user key; both window functions share the same
partitioning+ordering so Spark evaluates them in a single Window node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    order = [ts_col] + (order_cols or [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_session).over(running).cast("long"))
