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
    strategy: str = "join",
) -> DataFrame:
    """Match each left row to the nearest right row (per ``on`` key).

    ``left_keys`` must uniquely identify left rows (used to pick the single
    best match). ``direction='backward'`` takes the latest right_ts <=
    left_ts; ``'forward'`` the earliest right_ts >= left_ts.
    Ties on right_ts break on the remaining right columns' max — callers
    should order-determinize by including a unique right id in the frame,
    which we do by sorting on all of (right_ts, right columns).

    ``strategy='union'`` (left-join only) uses the merge-scan recipe
    instead: union both sides tagged, one window sort per key, and
    ``last(right_struct, ignorenulls)`` carries the nearest right row onto
    each left row (forward = the same scan over reversed time). No join
    fan-out at all — per-key cost is O(n log n) instead of
    O(n_left × n_right), which is what survives hot keys at 100 TB.
    Semantics match ``strategy='join'`` exactly (same tie-break).
    """
    if strategy == "union":
        return _asof_union(
            left, right, on, left_ts, right_ts, direction, tolerance_seconds, how
        )
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


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str,
    tolerance_seconds: int | None,
    how: str,
) -> DataFrame:
    """Union/merge-scan as-of (see ``asof_join`` docstring).

    Output schema matches the join strategy: left columns under alias ``l``,
    right columns under ``r`` (null structs where no match). Backward scans
    time ascending; forward is the identical scan over descending time.
    """
    if direction not in ("backward", "forward") or how != "left":
        raise ValueError("strategy='union' supports direction backward/forward, how='left'")
    backward = direction == "backward"
    rcols = [c for c in right.columns if c not in on]
    tie = [c for c in rcols if c != right_ts]
    # NULL semantics must match strategy='join': an equi-join never matches
    # NULL keys and a NULL timestamp satisfies no time condition. The
    # window scan would otherwise group NULL keys into one partition (a
    # NULL-key left row "matching" a NULL-key right row) and let NULL-ts
    # rows sort into match positions. Right rows with a NULL key or NULL
    # ts can match nothing — drop them from the scan entirely.
    r_valid = right
    for c in [*on, right_ts]:
        r_valid = r_valid.filter(F.col(c).isNotNull())
    right = r_valid
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(right.select(F.struct(*rcols).alias("s")).schema["s"].dataType).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType).alias("__l"),
        F.struct(*rcols).alias("__r"),
    )
    # Right rows sort BEFORE left rows at equal ts (ts-equal rows match);
    # among right ties the desired winner (max tie cols, matching the join
    # strategy's desc tie-break) is seen last → wins the running last().
    # Forward direction runs the identical scan over descending time.
    ts_order = F.col("__ts").asc() if backward else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__is_right").desc(), *[F.col(f"__r.{c}").asc_nulls_first() for c in tie])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
        # A NULL-ts left row satisfies no time condition in the join
        # strategy; in the forward scan (desc, nulls last) it would sit at
        # the end of the partition and pick up the running match — null it.
        .withColumn(
            "__match",
            F.when(F.col("__ts").isNull(), F.lit(None)).otherwise(F.col("__match")),
        )
    )
    if tolerance_seconds is not None:
        tol = F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        in_tol = (
            F.col(f"__match.{right_ts}") >= F.col("__ts") - tol
            if backward
            else F.col(f"__match.{right_ts}") <= F.col("__ts") + tol
        )
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match")).otherwise(F.lit(None))
        )
    # Expose the join strategy's l/r access pattern via struct columns:
    # F.col("l.x") / F.col("r.y") resolve as field access. r is null-struct
    # when unmatched (left-join semantics) — the on-keys come from the left
    # side, equal by construction.
    r_fields = [F.col(c).alias(c) for c in on] + [
        F.col(f"__match.{c}").alias(c) for c in rcols
    ]
    return matched.select(
        F.col("__l").alias("l"),
        F.when(F.col("__match").isNotNull(), F.struct(*r_fields)).alias("r"),
    )


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


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """KEYLESS interval join that stays a hash join at any scale.

    A time-range join with no equi key plans a BroadcastNestedLoopJoin —
    the shape the plan gate forbids on fact paths. Banding restores an
    equi key: with band width = the window span, each left row's window
    [ts+lower, ts+upper] overlaps at most 2 bands (exploded), and each
    right row owns exactly ONE band (its own ts), so every qualifying
    pair meets in exactly one band — no post-dedup — and the join is a
    plain shuffled equi join on the band integer. This is the batch twin
    of the watermark bucketing Structured Streaming uses for
    stream-stream interval joins.

    Columns are exposed with ``l.`` / ``r.`` aliases like range_join.
    """
    span_us = (upper_seconds - lower_seconds) * 1_000_000
    if span_us <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    lo = F.unix_micros(lts) + lower_seconds * 1_000_000
    hi = F.unix_micros(lts) + upper_seconds * 1_000_000
    lband = F.explode(
        F.sequence(F.floor(lo / span_us), F.floor(hi / span_us))
    ).alias("_band")
    l = left.alias("l").select("l.*", lband)
    r = right.alias("r").select(
        "r.*", F.floor(F.unix_micros(F.col(f"r.{right_ts}")) / span_us).alias("_rband")
    )
    cond = (
        (F.col("_band") == F.col("_rband"))
        & (F.unix_micros(F.col(f"r.{right_ts}")) >= F.unix_micros(F.col(f"l.{left_ts}")) + lower_seconds * 1_000_000)
        & (F.unix_micros(F.col(f"r.{right_ts}")) <= F.unix_micros(F.col(f"l.{left_ts}")) + upper_seconds * 1_000_000)
    )
    return l.alias("l").join(r.alias("r"), cond, "inner").drop("_band", "_rband")


def interval_agg_prefix_sum(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    sum_cols: list[str],
    left_keys: list[str],
    block_seconds: int = 3600,
) -> DataFrame:
    """Aggregate-only interval join that NEVER materializes pairs.

    For each left row, count and sum the right rows whose timestamp falls
    in ``[left_ts + lower, left_ts + upper]`` seconds — the same answer as
    ``banded_range_join`` + groupBy, but Θ((|L|+|R|) log) REGARDLESS of
    match density. The banded join (like DuckDB's IEJoin) is Θ(matches):
    doubling event density within a fixed time range quadruples its work
    even when the grouped output merely doubles (measured 2.83× wall at 2×
    data). This rewrite is the plan a 100 TB deployment runs when only the
    window aggregate is needed.

    Recipe (distributed prefix-sum scan):
    1. Tag right rows (tag=1, cnt=1, measures) and explode each left row
       into two boundary probes: a −1 probe at the window's lower bound
       (tag=0, sorts BEFORE right rows at the same µs, so the bound is
       inclusive after subtraction) and a +1 probe at the upper bound
       (tag=2, sorts AFTER, inclusive directly).
    2. Union, then cumulative-sum within coarse time blocks
       (``Window.partitionBy(block).orderBy(us, tag)`` with the default
       peer-inclusive RANGE frame — ties among probes carry cnt=0, so
       peer inclusion is harmless and the scan is deterministic).
    3. Add each block's exclusive prior-blocks total (a windowed sum over
       the TINY per-block totals table — its row count is bounded by
       time-span / block_seconds, not by data size — broadcast back).
    4. Per left key: Σ sign·cumulative. Rows with zero matches are
       DROPPED (inner-join parity with banded_range_join + groupBy).

    Requirements: ``left_keys`` uniquely identify left rows (two left rows
    sharing keys would merge their windows); ``sum_cols`` must be exact
    integer columns (cast to long) — partial sums in any order are then
    drift-free, which is what makes the answer bit-equal to the
    pair-materializing plan's.

    One wide shuffle (the block repartition of |R| + 2|L| rows), one tiny
    block-totals aggregate, one 2|L|-row groupBy. Parallelism = occupied
    blocks; pick ``block_seconds`` so the span/block ratio comfortably
    exceeds the cluster's core count.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    base = ["_cnt"] + [f"_m_{c}" for c in sum_cols]
    reserved = (
        {"_us", "_tag", "_sign", "_blk", "n_matches"}
        | set(base)
        | {f"{p}{m}" for m in base for p in ("_cum", "_pri", "_tot")}
        | {f"sum_{c}" for c in sum_cols}
    )
    for label, cols in (("left_keys", left_keys), ("sum_cols", sum_cols)):
        if len(set(cols)) != len(cols):
            dupes = sorted({c for c in cols if cols.count(c) > 1})
            raise ValueError(f"{label} contains duplicates: {dupes}")
    # Same guard for sum_cols as for left_keys: a sum_col named so that
    # _m_<c> (or sum_<c>) collides with another internal/output name
    # would otherwise surface later as an opaque ambiguous-column error.
    # _us/_tag never clash via sum_cols directly (they lack the _m_
    # prefix), but a sum_col literally named one of the reserved tokens
    # is still caught here before it reaches a select.
    for label, cols in (("left_keys", left_keys), ("sum_cols", sum_cols)):
        clash = reserved & set(cols)
        if clash:
            raise ValueError(
                f"{label} collide with internal/output columns: {sorted(clash)}"
            )
    # NULL timestamps never satisfy the interval predicate in the
    # pair-materializing plan; filtering them here (instead of letting
    # NULL probes and NULL points meet as peers in the NULL sort group)
    # keeps the two plans' answers identical.
    left = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    key_fields = [(f.name, f.dataType) for f in left.select(*left_keys).schema.fields]
    zero = F.lit(0).cast("long")
    meas = ["_cnt"] + [f"_m_{c}" for c in sum_cols]
    points = right.select(
        F.unix_micros(F.col(right_ts)).alias("_us"),
        F.lit(1).alias("_tag"),
        F.lit(0).alias("_sign"),
        *[F.lit(None).cast(dt).alias(nm) for nm, dt in key_fields],
        F.lit(1).cast("long").alias("_cnt"),
        *[F.col(c).cast("long").alias(f"_m_{c}") for c in sum_cols],
    )
    lo_us = F.unix_micros(F.col(left_ts)) + lower_seconds * 1_000_000
    hi_us = F.unix_micros(F.col(left_ts)) + upper_seconds * 1_000_000
    probes = left.select(
        *left_keys,
        F.explode(
            F.array(
                F.struct(
                    lo_us.alias("_us"), F.lit(0).alias("_tag"), F.lit(-1).alias("_sign")
                ),
                F.struct(
                    hi_us.alias("_us"), F.lit(2).alias("_tag"), F.lit(1).alias("_sign")
                ),
            )
        ).alias("_p"),
    ).select(
        F.col("_p._us").alias("_us"),
        F.col("_p._tag").alias("_tag"),
        F.col("_p._sign").alias("_sign"),
        *left_keys,
        zero.alias("_cnt"),
        *[zero.alias(f"_m_{c}") for c in sum_cols],
    )
    u = points.unionByName(probes).withColumn(
        "_blk", F.floor(F.col("_us") / F.lit(block_seconds * 1_000_000))
    )
    w_in = Window.partitionBy("_blk").orderBy("_us", "_tag")
    cum = u.select(
        "*", *[F.sum(m).over(w_in).alias(f"_cum{m}") for m in meas]
    )
    # Per-block totals re-aggregate the pre-window union (a second
    # pushdown-filtered scan). Measured AGAINST the "free"-looking
    # alternative — max_by(cum, (_us,_tag)) over the windowed output,
    # which should share the window's Exchange via ReuseExchange: AQE
    # never reused the stage and the struct-ordered max_by aggregate
    # cost more than the rescan (2.81 s vs 1.88 s at 10 M events), so
    # the straightforward double scan stays.
    totals = u.groupBy("_blk").agg(*[F.sum(m).alias(f"_tot{m}") for m in meas])
    w_blk = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    prior = totals.select(
        "_blk",
        *[
            F.coalesce(F.sum(f"_tot{m}").over(w_blk), zero).alias(f"_pri{m}")
            for m in meas
        ],
    )
    scanned = cum.filter(F.col("_tag") != 1).join(F.broadcast(prior), "_blk", "left")
    out_names = {"_cnt": "n_matches"}
    out_names.update({f"_m_{c}": f"sum_{c}" for c in sum_cols})
    aggs = [
        F.sum(
            F.col("_sign")
            * (F.coalesce(F.col(f"_pri{m}"), zero) + F.col(f"_cum{m}"))
        ).alias(out_names[m])
        for m in meas
    ]
    return scanned.groupBy(*left_keys).agg(*aggs).filter(F.col("n_matches") > 0)
