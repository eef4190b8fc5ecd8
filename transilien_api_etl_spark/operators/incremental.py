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


def merge_seen_dedup(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    content_cols: list[str],
    order_col: str,
) -> None:
    """Fold one micro-batch into a FIRST-SEEN-WINS deduplicated corpus.

    The streaming form of exact corpus dedup (a continuously-ingesting
    training-data pipeline's front door): a row whose content digest was
    appended by ANY earlier batch is dropped; within a batch the survivor
    is the smallest ``order_col``. Exactly-once under foreachBatch crash
    replays: rows land partitioned by ``_batch``, so the replay check is a
    partition-directory listing (no data read), and a batch id ≤ the
    stored maximum is a no-op. Scale posture: the anti-join probes the
    stored side on its digest column only (column-pruned scan); at 100 TB
    the digest store would additionally bucket by digest prefix so the
    probe prunes files — the batch side is always micro-batch-sized.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    spark = batch_df.sparkSession
    digest = F.sha2(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]), 256)
    w = Window.partitionBy("_digest").orderBy(order_col)
    fresh = (
        batch_df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    try:
        stored = spark.read.parquet(path)
        applied = stored.agg(F.max("_batch")).first()[0]
        if applied is not None and batch_id >= 0 and batch_id <= applied:
            return  # replayed batch: its rows are already in the corpus
        fresh = fresh.join(
            stored.select("_digest"), "_digest", "left_anti"
        )
    except AnalysisException:
        pass  # first batch: everything is first-seen
    (
        fresh.withColumn("_batch", F.lit(batch_id).cast("long"))
        .write.mode("append")
        .partitionBy("_batch")
        .parquet(path)
    )


def read_seen_dedup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_digest", "_batch")
