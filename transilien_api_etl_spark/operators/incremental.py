"""Incremental aggregate maintenance (the streaming-warehouse pattern:
a materialized group-by kept current by micro-batch deltas, never by
recomputing the history).

``merge_additive_agg`` folds one micro-batch's partial aggregate into a
stored aggregate table:

    stored[k] ⊕ delta[k]   for additive measures (count, sum)

with REPLAY PROTECTION and CRASH ATOMICITY: each merge writes a fresh
versioned subdirectory ``v=<batch_id>`` and then atomically repoints a
``_CURRENT`` manifest (temp file + ``os.rename``, atomic on POSIX; the
object-store deployment would use the store's atomic primitive — S3
conditional PUT, HDFS rename). The manifest records the last applied
batch_id, so a batch whose id is ≤ it is a no-op — foreachBatch
re-delivers the same (batch_id, data) after a crash. A crash BEFORE the
repoint leaves the previous version live (the half-written ``v=`` dir is
overwritten by the replay); a crash AFTER the repoint makes the replay a
no-op. This is the same version-and-swap trick a Delta/transactional
sink's log commit performs, done with plain parquet + one manifest file.

Scale posture: the micro-batch side aggregates BEFORE the merge (delta is
|keys touched this batch| rows, not |events|); the stored side is read
back only for the touched keys' partitions. At 100 TB the merge cost is
bounded by the batch's key footprint, never the table size.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_additive_agg(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
    retain_versions: int = 2,
) -> None:
    """Fold one micro-batch into the stored additive aggregate at ``path``.

    ``sum_cols`` maps input column → stored sum column. The stored schema is
    keys + count + sums + ``_last_batch``; data lives in ``path/v=<batch>``
    with ``path/_CURRENT`` naming the live version (see module docstring
    for the crash-atomicity contract).

    ``retain_versions`` is the reader-grace window (ADVICE r3): each swap
    keeps the newest N version dirs and prunes the rest, so a reader that
    resolved the manifest up to N-1 swaps ago can still finish its scan.
    The default (2 = new + immediately-previous) is sized for the
    single-writer / short-reader streaming posture documented on
    :func:`read_additive_agg`; raise it if slow concurrent batch readers
    may span several merge cycles.
    """
    spark = batch_df.sparkSession
    sum_cols = sum_cols or {}

    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)] + [
        F.sum(src).alias(dst) for src, dst in sum_cols.items()
    ]
    delta = batch_df.groupBy(*keys).agg(*aggs).withColumn(
        "_last_batch", F.lit(batch_id).cast("long")
    )

    current = _read_manifest(path)
    if current is not None:
        applied, live_dir = current
        if batch_id <= applied:
            return  # replayed batch: already folded in, must be a no-op
        stored = spark.read.parquet(f"{path}/{live_dir}")
        measures = [count_col, *sum_cols.values()]
        merged = (
            stored.unionByName(delta)
            .groupBy(*keys)
            .agg(
                *[F.sum(m).alias(m) for m in measures],
                F.max("_last_batch").alias("_last_batch"),
            )
        )
    else:  # first batch: the delta IS the aggregate
        live_dir = None
        merged = delta

    new_dir = f"v={batch_id}"
    # A fresh directory: overwriting it only ever clobbers a half-written
    # attempt of THIS batch left by a crash — the live version is untouched
    # until the manifest swap below.
    merged.write.mode("overwrite").parquet(f"{path}/{new_dir}")
    _swap_manifest(
        path, batch_id, new_dir, keep={new_dir, live_dir}, retain=retain_versions
    )


def _manifest_file(path: str) -> str:
    return os.path.join(path, "_CURRENT")


def _read_manifest(path: str) -> tuple[int, str] | None:
    """(last applied batch_id, live version dir), or None before batch 1.

    Only a MISSING manifest means "no committed aggregate". A manifest
    that exists but cannot be parsed is corruption (e.g. torn blocks
    from a power loss that beat the fsync) and raises loudly — silently
    treating it as first-batch would reset history to one delta and let
    the prune delete every surviving version."""
    try:
        with open(_manifest_file(path), encoding="utf-8") as fh:
            content = fh.read()
    except FileNotFoundError:
        return None
    try:
        batch_s, ver_dir = content.split("\n")[:2]
        if not ver_dir:
            raise ValueError("empty version dir")
        return int(batch_s), ver_dir
    except ValueError as e:
        raise RuntimeError(
            f"corrupt aggregate manifest {_manifest_file(path)!r} "
            f"(content={content!r}): refusing to reset history — restore "
            "the manifest to point at the newest intact v=<batch> dir"
        ) from e


def _swap_manifest(
    path: str, batch_id: int, ver_dir: str, keep: set[str | None], retain: int = 2
) -> None:
    """Atomically repoint ``_CURRENT`` and prune superseded version dirs.

    The newest ``retain`` version dirs survive the prune (always including
    ``keep`` — the new and previous live versions), so a reader that
    resolved the manifest up to ``retain - 1`` swaps ago can still finish
    its scan; anything older is best-effort deleted.
    """
    tmp = _manifest_file(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"{batch_id}\n{ver_dir}\n")
        fh.flush()
        os.fsync(fh.fileno())  # data blocks durable BEFORE the rename
    os.rename(tmp, _manifest_file(path))  # atomic on POSIX
    # …and the rename itself durable (directory entry), so a power loss
    # after this point can't resurrect the previous manifest.
    dir_fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)

    def _batch_of(entry: str) -> int:
        try:
            return int(entry[2:])
        except ValueError:
            return -1  # malformed v= dir: oldest, pruned first

    versions = sorted(
        (e for e in os.listdir(path) if e.startswith("v=")),
        key=_batch_of,
        reverse=True,
    )
    survivors = set(versions[: max(retain, 1)]) | {k for k in keep if k}
    for entry in versions:
        if entry not in survivors:
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)


def read_additive_agg(spark: SparkSession, path: str) -> DataFrame:
    """Read the live version of the stored aggregate.

    CONCURRENCY CONTRACT (the read-grace window): the version dir this
    resolves stays on disk only until it falls out of the writer's
    ``retain_versions`` newest (default 2 — this version plus one more
    swap). A scan that outlives that many merges can have its parquet
    files pruned mid-read. Fine for the intended single-writer posture
    with reads that are short relative to the micro-batch interval; for
    slow concurrent batch readers, raise ``retain_versions`` on the
    writer so the grace window covers the longest expected scan.
    """
    current = _read_manifest(path)
    if current is None:
        raise FileNotFoundError(f"no committed aggregate under {path}")
    return spark.read.parquet(f"{path}/{current[1]}").drop("_last_batch")


def _holds_no_data(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists but contains only writer artifacts.

    A committed-but-empty corpus (an empty first micro-batch writes just
    ``_SUCCESS``; a pre-created temp dir writes nothing) must read as
    "no corpus yet". Names starting with ``_`` or ``.`` are committer/
    metadata artifacts — with the one exception of ``_<col>=`` partition
    directories (this store partitions by ``_batch``), which ARE data.
    Uses the Hadoop FileSystem API so the answer is right on any
    deployment filesystem (S3/HDFS), not just local disk.
    """
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return True
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if "=" in name or not name.startswith(("_", ".")):
            return False
    return True


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
    replays: rows land partitioned by ``_batch``. A batch id strictly
    below the stored maximum is a no-op (a later batch started, so this
    one's streaming commit had succeeded). A batch id EQUAL to the
    stored maximum is the crash-replay case — its partition may hold
    only part of the batch (crash mid job-commit) — so the
    possibly-partial ``_batch=<id>`` directory is deleted and the batch
    rewritten against strictly-earlier batches only. Scale posture: the
    anti-join probes the stored side on its digest column only
    (column-pruned, partition-pruned scan); at 100 TB the digest store
    would additionally bucket by digest prefix so the probe prunes files
    — the batch side is always micro-batch-sized.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    spark = batch_df.sparkSession
    # Injective content digest — the ONE shared encoding
    # (operators/dedup.canonical_row_hash): concat_ws drops NULL columns,
    # so ("a", NULL, "b") and ("a", "b", NULL) would collide and silently
    # drop a distinct row. Sharing the helper (not a copy of its body)
    # means a future fix to the canonical encoding cannot leave this
    # streaming ledger computing a different digest than the batch path.
    # NOTE: the digest formula is part of a PERSISTED store's contract —
    # changing canonical_row_hash invalidates ledgers written before it.
    from transilien_api_etl_spark.operators.dedup import canonical_row_hash

    digest = canonical_row_hash(content_cols)
    w = Window.partitionBy("_digest").orderBy(order_col)
    fresh = (
        batch_df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    stored = None
    try:
        stored = spark.read.parquet(path)
    except AnalysisException as e:
        # "First batch" has three shapes, all raising from the read:
        # the path does not exist yet (PATH_NOT_FOUND); a caller
        # pre-created an EMPTY directory (e.g. tempfile.mkdtemp); or an
        # earlier EMPTY batch committed, leaving only writer artifacts
        # (_SUCCESS) and no data files. The latter two raise
        # UNABLE_TO_INFER_SCHEMA — tolerated only when the directory
        # holds nothing but committer artifacts. Any other analysis
        # error (schema/column drift, a dir with real content that still
        # can't be read) must surface, not silently skip cross-batch
        # dedup. The check goes through the Hadoop FileSystem API (like
        # the replay delete below) so it is correct on S3/HDFS too, not
        # just the local driver disk.
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))()
        cond = cond or ""
        if cond != "PATH_NOT_FOUND" and not (
            cond == "UNABLE_TO_INFER_SCHEMA" and _holds_no_data(spark, path)
        ):
            raise
    if stored is not None:
        applied = stored.agg(F.max("_batch")).first()[0]
        if applied is not None and 0 <= batch_id < applied:
            return  # older batch: fully committed before a later one started
        if applied is not None and batch_id == applied:
            # Crash-replay of the newest batch: its partition may be
            # partial — drop it; the append below rewrites the batch.
            jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/_batch={batch_id}")
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        probe = stored.filter(F.col("_batch") < batch_id) if batch_id >= 0 else stored
        fresh = fresh.join(probe.select("_digest"), "_digest", "left_anti")
    (
        fresh.withColumn("_batch", F.lit(batch_id).cast("long"))
        .write.mode("append")
        .partitionBy("_batch")
        .parquet(path)
    )


def read_seen_dedup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_digest", "_batch")
