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
    observation time). Rows whose ``change_cols`` are unchanged vs the open
    version are dropped (no spurious versions); changed/new keys close the
    open row at the incoming effective time and append the new version.
    """
    open_end = F.lit(OPEN_END).cast("timestamp")
    fresh = incoming.select(
        *key_cols,
        *change_cols,
        F.col(effective_col).alias("valid_from"),
        open_end.alias("valid_to"),
    )
    if current is None:
        return fresh

    is_open = F.col("valid_to") == open_end
    open_rows = current.filter(is_open)
    closed_rows = current.filter(~is_open)

    cmp_cols = [F.col(c) for c in change_cols]
    changed = (
        fresh.alias("n")
        .join(open_rows.alias("o"), key_cols, "left")
        .filter(
            F.coalesce(
                ~F.struct(*[F.col(f"n.{c}") for c in change_cols]).eqNullSafe(
                    F.struct(*[F.col(f"o.{c}") for c in change_cols])
                ),
                F.lit(True),  # brand-new key
            )
        )
        .select(*[F.col(f"n.{c}") for c in [*key_cols, *change_cols, "valid_from", "valid_to"]])
    )

    # close open rows superseded by a changed version
    superseded = open_rows.alias("o").join(
        changed.select(*key_cols, F.col("valid_from").alias("_new_from")).alias("c"),
        key_cols,
        "inner",
    )
    closed_now = superseded.select(
        *[F.col(f"o.{c}") for c in [*key_cols, *change_cols, "valid_from"]],
        F.col("_new_from").alias("valid_to"),
    )
    untouched_open = open_rows.join(changed.select(*key_cols), key_cols, "left_anti")

    return closed_rows.unionByName(closed_now).unionByName(untouched_open).unionByName(changed)


def current_view(history: DataFrame) -> DataFrame:
    """The SCD1 projection of an SCD2 history: open rows only."""
    return history.filter(F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))


def as_of_view(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time snapshot: versions valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
