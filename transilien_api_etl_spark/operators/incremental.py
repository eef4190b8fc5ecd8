"""Incremental aggregate maintenance (the streaming-warehouse pattern:
a materialized group-by kept current by micro-batch deltas, never by
recomputing the history).

``merge_additive_agg`` folds one micro-batch's partial aggregate into a
stored aggregate table:

    stored[k] ⊕ delta[k]   for additive measures (count, sum)

with REPLAY PROTECTION: the stored table carries the last applied
batch_id, and a batch whose id is ≤ the stored maximum is a no-op —
foreachBatch re-delivers the same (batch_id, data) after a crash, so
additive merges are only exactly-once if re-application is idempotent.
This is the same ledger trick a Delta/transactional sink uses, done with
plain parquet + dynamic partition overwrite.

Scale posture: the micro-batch side aggregates BEFORE the merge (delta is
|keys touched this batch| rows, not |events|); the stored side is read
back only for the touched keys' partitions. At 100 TB the merge cost is
bounded by the batch's key footprint, never the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_additive_agg(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> None:
    """Fold one micro-batch into the stored additive aggregate at ``path``.

    ``sum_cols`` maps input column → stored sum column. The stored schema is
    keys + count + sums + ``_last_batch``.
    """
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    sum_cols = sum_cols or {}

    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)] + [
        F.sum(src).alias(dst) for src, dst in sum_cols.items()
    ]
    delta = batch_df.groupBy(*keys).agg(*aggs).withColumn(
        "_last_batch", F.lit(batch_id).cast("long")
    )

    try:
        stored = spark.read.parquet(path)
        applied = stored.agg(F.max("_last_batch")).first()[0]
        if applied is not None and batch_id <= applied:
            return  # replayed batch: already folded in, must be a no-op
        stored = stored.localCheckpoint(eager=True)  # safe read-back overwrite
        measures = [count_col, *sum_cols.values()]
        merged = (
            stored.unionByName(delta)
            .groupBy(*keys)
            .agg(
                *[F.sum(m).alias(m) for m in measures],
                F.max("_last_batch").alias("_last_batch"),
            )
        )
    except AnalysisException:  # first batch: the delta IS the aggregate
        merged = delta
    merged.write.mode("overwrite").parquet(path)


def read_additive_agg(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_last_batch")
