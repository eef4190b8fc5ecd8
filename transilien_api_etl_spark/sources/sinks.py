"""Sinks (SURVEY.md §3.1 S4-S6).

- ``write_partitioned``: the 100 TB warehouse layout — parquet partitioned
  by service day / date so every day-scoped query partition-prunes its scan
  (static + dynamic partition pruning both apply).
- ``upsert_by_key``: idempotent same-key-overwrite semantics (the reference
  Dynamo ``batch_write``): newest record per key wins, written with dynamic
  partition overwrite so re-running a day is idempotent, never duplicating.
- ``read_jdbc`` / ``write_jdbc``: the reference's Postgres leg (S4) — thin
  declarative wrappers over Spark's built-in JDBC source (predicate pushdown
  and parallel partitioned reads come free). Exercised end-to-end against
  the embedded Derby engine PySpark bundles (tests/test_jdbc.py: write →
  read round-trip, 4-way range-partitioned read, WHERE + projection pushed
  into the generated SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet warehouse sink (S6)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def upsert_by_key(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Idempotent key-value upsert / MERGE (S5): newest row per key wins
    (``order_col`` desc), existing rows for other keys survive.

    Spark-first equivalent of the reference's Dynamo same-key overwrite:
    merge = union(existing, incoming) → window-rank dedup → rewrite. With
    ``partition_cols``, only the partitions present in the incoming batch
    are read back and rewritten (dynamic partition overwrite) — at 100 TB
    the merge cost is bounded by the touched partitions (e.g. one service
    day), never the table. Replaying the same batch is a no-op by
    construction. The existing slice is localCheckpoint-ed so reading and
    overwriting the same path in one job is safe.
    """
    from pyspark.errors import AnalysisException

    from transilien_api_etl_spark.operators.incremental import _holds_no_data

    spark = df.sparkSession
    existing = None
    try:
        existing = spark.read.parquet(path)
    except AnalysisException as e:
        # "First write" has two shapes: the path does not exist yet
        # (PATH_NOT_FOUND) or a caller pre-created an EMPTY directory —
        # e.g. tempfile.mkdtemp — which raises UNABLE_TO_INFER_SCHEMA
        # (the exact first-batch divergence that broke the incremental
        # dedup store in round 4; tolerated only when the dir holds
        # nothing but committer artifacts). Anything else (a schema/
        # column mismatch, a dir with real content that still can't be
        # read) must surface: swallowing it would make `merged = df`
        # alone and the overwrite below would silently drop every
        # existing key not present in the incoming batch.
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))()
        cond = cond or ""
        if cond != "PATH_NOT_FOUND" and not (
            cond == "UNABLE_TO_INFER_SCHEMA" and _holds_no_data(spark, path)
        ):
            raise
    if existing is None:
        merged = df
    else:
        if partition_cols:
            touched = df.select(*partition_cols).distinct()
            existing = existing.join(F.broadcast(touched), partition_cols, "left_semi")
        merged = existing.select(*df.columns).localCheckpoint(eager=True).unionByName(df)
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    writer = latest.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read (S4). With a partition column, Spark issues
    ``num_partitions`` range-sliced queries — the scalable path."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """JDBC write (S4); batch inserts, parallel per partition."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    one_file_per_bucket: bool = True,
    path: str | None = None,
) -> None:
    """Bucketed managed table (S6 scale variant): co-locates rows by hash of
    ``bucket_cols`` at write time so later joins/aggs on those keys read
    pre-shuffled data — at 100 TB this converts every recurring fact⋈fact
    join on the bucket key into a zero-exchange sort-merge join. Sorting
    within buckets additionally drops the sort from the join.

    ``one_file_per_bucket`` pre-shuffles the input on ``bucket_cols`` into
    exactly ``n_buckets`` partitions. ``repartition(n, cols)`` uses the same
    Murmur3 HashPartitioning as the bucket spec, so each write task holds
    exactly one bucket's rows and emits one file. Without it every task
    writes up to ``n_buckets`` files (tasks x buckets small-file explosion at
    cluster scale), and — because Spark only trusts bucket sort order when a
    bucket is a single file — downstream merge joins re-Sort, defeating
    ``sort_cols``. Disable only for single-shot writes of data already
    partitioned on the key. ``path`` makes the table EXTERNAL at that
    location instead of managed-in-warehouse."""
    if one_file_per_bucket:
        df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a (bucketed) managed table."""
    return spark.table(table)


def ensure_bucketed_external(
    spark: SparkSession,
    src: DataFrame,
    table: str,
    location: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    source_id: str | None = None,
) -> bool:
    """Idempotently materialize ``src`` as an EXTERNAL bucketed table.

    The expensive part of a bucketed layout is the one-time clustered
    write; the catalog entry is metadata. Under Spark's default in-memory
    catalog the entry dies with the session while the files survive, so a
    fresh session over an already-written location only needs a
    ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` DDL (bucket ids are
    carried in the file names, so the scan re-associates files to buckets
    with no data movement). A ``_BUCKET_SPEC.json`` marker records the
    layout AND ``source_id`` (pass the source dataset's path or factor
    string): a mismatch on either forces a rewrite instead of silently
    serving a stale clustering — or worse, a clustering of a DIFFERENT
    dataset after the caller re-points its source.

    Returns True when the data was (re)written, False when only the
    catalog entry was refreshed — callers can keep the write out of their
    timed sections.
    """
    import json
    import os
    import shutil

    spec = {
        "bucket_cols": list(bucket_cols),
        "n_buckets": n_buckets,
        "sort_cols": list(sort_cols or []),
        "layout": "one_file_per_bucket_v2",
        "source_id": source_id,
    }
    marker = os.path.join(location, "_BUCKET_SPEC.json")
    committed = os.path.isfile(os.path.join(location, "_SUCCESS"))
    spec_ok = False
    if committed and os.path.isfile(marker):
        try:
            with open(marker, encoding="utf-8") as fh:
                spec_ok = json.load(fh) == spec
        except (OSError, ValueError):
            spec_ok = False

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if committed and spec_ok:
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
        )
        sorted_by = (
            f"SORTED BY ({', '.join(sort_cols)}) " if sort_cols else ""
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({', '.join(bucket_cols)}) {sorted_by}"
            f"INTO {n_buckets} BUCKETS LOCATION '{location}'"
        )
        return False

    shutil.rmtree(location, ignore_errors=True)
    write_bucketed(
        src, table, bucket_cols, n_buckets, sort_cols=sort_cols, path=location
    )
    with open(marker, "w", encoding="utf-8") as fh:
        json.dump(spec, fh)
    return True


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout (S6 scan-pruning variant): global
    range partitioning on ``cluster_cols`` + a sort within each output file.

    Every file then covers a narrow, pairwise-disjoint range of the cluster
    key, so its parquet footer min/max statistics let point/range predicates
    skip whole files and row groups — the poor man's clustering index. At
    100 TB this is the difference between scanning the table and scanning
    the few files a ``WHERE ts BETWEEN ...`` actually touches; it composes
    with ``write_partitioned`` (partition by day, range-cluster by hour
    inside each partition). tests/test_warehouse_ops.py asserts footer-level
    disjointness via pyarrow.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def jdbc_exactly_once_sink(url: str, table: str, driver: str):
    """foreachBatch sink: EXACTLY-ONCE streaming append into a JDBC table.

    The weak spot of naive foreachBatch-to-JDBC is the crash window between
    "rows inserted" and "checkpoint advanced" — a restart replays the batch
    and double-inserts. Closed here with the stage-then-publish protocol:

    1. the micro-batch is written (parallel, idempotent ``overwrite``) to a
       per-sink staging table;
    2. ONE database transaction then checks the batch-id audit table,
       INSERT..SELECTs staging into the target (rows never pass through
       the driver), and records the batch id — commit is atomic, so a
       replayed batch sees its id and no-ops.

    Works on any JDBC database with transactions; exercised against the
    embedded Derby engine in tests/test_jdbc.py."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stage = f"{table}_stage"
        write_jdbc(batch_df, url, stage, mode="overwrite", driver=driver)
        jvm = spark._jvm
        jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            # Each CREATE commits alone: a pre-existing table must not roll
            # back a sibling CREATE that succeeded in the same txn.
            for ddl in (
                f"CREATE TABLE {table}_audit (batch_id BIGINT PRIMARY KEY)",
                f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA",
            ):
                try:
                    st.executeUpdate(ddl)
                    conn.commit()
                except Exception:
                    conn.rollback()  # table exists — restart the txn cleanly
            rs = st.executeQuery(
                f"SELECT count(*) FROM {table}_audit WHERE batch_id = {int(batch_id)}"
            )
            rs.next()
            if rs.getInt(1) > 0:
                conn.rollback()
                return
            st.executeUpdate(f"INSERT INTO {table} SELECT * FROM {stage}")
            st.executeUpdate(
                f"INSERT INTO {table}_audit VALUES ({int(batch_id)})"
            )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write_batch
