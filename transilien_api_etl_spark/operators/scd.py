"""Slowly-changing-dimension type-2 merge (warehouse history keeping).

The reference overwrites records in place (Dynamo upsert — SCD1);
``upsert_by_key`` reproduces that. ``scd2_merge`` is the history-keeping
variant a warehouse needs: instead of overwriting, close the current
version (set ``valid_to``) and append the new one — emulated without
Delta/Iceberg MERGE via anti-join + union + window, all shuffling once on
the business key.

Scale posture: both inputs hash-partition on the key for one sort-merge
pass; the dimension history is append-mostly, so at 100 TB this runs as a
partition-bounded rewrite exactly like ``upsert_by_key`` when the table is
partitioned by a stable key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 00:00:00"


def scd2_merge(
    current: DataFrame | None,
    incoming: DataFrame,
    key_cols: list[str],
    change_cols: list[str],
    effective_col: str,
) -> DataFrame:
    """Merge ``incoming`` snapshots into an SCD2 ``current`` history.

    ``current`` has key_cols + change_cols + ``valid_from``/``valid_to``
    (open rows carry ``valid_to = 9999-12-31``); pass ``None`` to bootstrap.
    ``incoming`` has key_cols + change_cols + ``effective_col`` (the
    observation time) and MAY carry several snapshots per key in one batch:
    snapshots are sequenced per key by effective time (ties collapse to one
    deterministic survivor), consecutive unchanged snapshots are compressed
    away, and surviving versions chain ``valid_to = lead(valid_from)`` so at
    most one version per key is left open. Keys whose earliest surviving
    snapshot equals the open version produce no spurious new version.
    """
    open_end = F.lit(OPEN_END).cast("timestamp")
    val = F.struct(*[F.col(c) for c in change_cols])

    # 1. Sequence the batch per key: one row per (key, effective) — equal
    #    timestamps keep one deterministic survivor — then drop any snapshot
    #    equal to its predecessor (runs of equal values compress to their
    #    first element; in a run every non-first row equals its neighbour).
    w_key = Window.partitionBy(*key_cols).orderBy(F.col("valid_from").asc())
    fresh = (
        incoming.select(
            *key_cols, *change_cols, F.col(effective_col).alias("valid_from")
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*key_cols, "valid_from").orderBy(val.asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("__same_prev", val.eqNullSafe(F.lag(val).over(w_key)))
        .filter(~F.coalesce(F.col("__same_prev"), F.lit(False)))
        .drop("__same_prev")
    )

    if current is not None:
        is_open = F.col("valid_to") == open_end
        open_rows = current.filter(is_open)
        closed_rows = current.filter(~is_open)
        # 2. Drop each key's FIRST surviving snapshot when it matches the
        #    open version (no spurious version); later snapshots already
        #    differ from it by step 1's compression.
        first_new = F.row_number().over(w_key) == 1
        fresh = (
            fresh.alias("n")
            .join(
                open_rows.select(*key_cols, val.alias("__open_val")).alias("o"),
                key_cols,
                "left",
            )
            .withColumn("__first", first_new)
            .filter(
                ~(F.col("__first") & val.eqNullSafe(F.col("__open_val")))
                | F.col("__open_val").isNull()
            )
            .select(*key_cols, *change_cols, "valid_from")
        )

    # 3. Chain versions inside the batch: each closes at the next's start.
    chained = fresh.withColumn(
        "valid_to", F.coalesce(F.lead("valid_from").over(w_key), open_end)
    )
    if current is None:
        return chained

    # 4. Close the previously-open row at the first surviving snapshot.
    # Out-of-order batch guard (enforce, don't corrupt): an incoming
    # effective time BEFORE the open row's own valid_from would invert the
    # interval (valid_to < valid_from), making the open version vanish
    # from every as_of_view — a late-arriving batch needs an explicit
    # history rewrite, not a silent merge. raise_error keeps the check
    # lazy (no extra driver-side action) and fires only on bad data.
    first_from = fresh.groupBy(*key_cols).agg(F.min("valid_from").alias("_new_from"))
    closed_now = (
        open_rows.join(first_from, key_cols, "inner")
        .withColumn(
            "valid_to",
            F.when(
                F.col("_new_from") < F.col("valid_from"),
                F.raise_error(
                    F.concat(
                        F.lit("scd2_merge: out-of-order batch — incoming effective "),
                        F.col("_new_from").cast("string"),
                        F.lit(" precedes the open version's valid_from "),
                        F.col("valid_from").cast("string"),
                        F.lit("; rewrite history explicitly for late arrivals"),
                    )
                ).cast("timestamp"),
            ).otherwise(F.col("_new_from")),
        )
        .drop("_new_from")
    )
    untouched_open = open_rows.join(first_from.select(*key_cols), key_cols, "left_anti")

    return closed_rows.unionByName(closed_now).unionByName(untouched_open).unionByName(chained)


def current_view(history: DataFrame) -> DataFrame:
    """The SCD1 projection of an SCD2 history: open rows only."""
    return history.filter(F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))


def as_of_view(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time snapshot: versions valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    how: str = "left",
) -> DataFrame:
    """Feature-store point-in-time join: each fact row picks the dimension
    VERSION in force at its own timestamp — ``valid_from <= fact_ts <
    valid_to`` per key — never a later one (no feature leakage from the
    future), never an earlier one once superseded.

    Implemented as an as-of join on ``valid_from`` (backward, per key)
    rather than a range join: the union/merge-scan strategy gives one
    shuffle and zero fan-out, and because SCD2 versions per key are
    contiguous half-open intervals, "latest valid_from at or before
    fact_ts" IS the interval containing fact_ts. Rows whose fact_ts
    precedes the key's first version keep null attributes under
    ``how='left'`` (the honest answer for not-yet-existing entities).
    """
    from transilien_api_etl_spark.operators.joins import asof_join

    matched = asof_join(
        facts,
        history,
        on=key_cols,
        left_ts=fact_ts,
        right_ts="valid_from",
        left_keys=[fact_ts],
        direction="backward",
        strategy="union",
    )
    # Enforce the fact_ts < valid_to half of the interval predicate: the
    # backward as-of alone would let a fact dated AFTER a key's last
    # CLOSED version (a deletion-aware or hand-maintained history need
    # not end open) inherit that superseded version's attributes.
    matched = matched.withColumn(
        "r",
        F.when(
            F.col("r").isNotNull() & (F.col(f"l.{fact_ts}") < F.col("r.valid_to")),
            F.col("r"),
        ),
    )
    attr_cols = [
        c for c in history.columns if c not in (*key_cols, "valid_from", "valid_to")
    ]
    out = matched.select(
        *[F.col(f"l.{c}").alias(c) for c in facts.columns],
        *[F.col(f"r.{c}").alias(c) for c in ("valid_from", "valid_to", *attr_cols)],
    )
    if how == "inner":
        out = out.filter(F.col("valid_from").isNotNull())
    return out
