"""Incremental first-seen-wins corpus dedup: 8 micro-batches must yield
exactly the one-shot keep-first dedup, batch replays must be no-ops, and a
duplicate arriving in a LATER batch must lose to the earlier batch's copy
even though they never meet in the same micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.incremental import (
    merge_seen_dedup,
    read_seen_dedup,
)

SF = "/root/testdata/sf0.01"
CONTENT = ["user_id", "event_type", "value"]


def _keepers(e):
    from pyspark.sql import Window

    w = Window.partitionBy(*CONTENT).orderBy("event_id")
    return {
        r.event_id
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id")
        .collect()
    }


def test_incremental_dedup_equals_batch_and_replay_is_noop(spark, tmp_path):
    e = load_table(spark, SF, "events").select("event_id", *CONTENT)
    path = str(tmp_path / "corpus")

    # slice by event_id: duplicates of one content usually land in
    # DIFFERENT batches, exercising the cross-batch anti-join path
    batches = [
        e.filter(F.pmod(F.col("event_id"), F.lit(8)) == i).localCheckpoint(
            eager=True
        )
        for i in range(8)
    ]
    for i, b in enumerate(batches):
        merge_seen_dedup(b, i, path, CONTENT, "event_id")

    got = {r.event_id for r in read_seen_dedup(spark, path).collect()}
    # NB: slicing by event_id%8 means batch order follows event_id order
    # within each content group only if the first occurrence's slice runs
    # first — which it does NOT in general, so recompute the expected set
    # under the actual arrival order: first batch index, then event_id.
    from pyspark.sql import Window

    w = Window.partitionBy(*CONTENT).orderBy(
        F.pmod(F.col("event_id"), F.lit(8)), "event_id"
    )
    expected = {
        r.event_id
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id")
        .collect()
    }
    assert got == expected
    # distinct content count must match the one-shot dedup regardless of
    # which copy survived
    assert len(got) == e.select(*CONTENT).distinct().count()

    # crash-replay of the last and an early batch: both no-ops
    before = got
    merge_seen_dedup(batches[7], 7, path, CONTENT, "event_id")
    merge_seen_dedup(batches[3], 3, path, CONTENT, "event_id")
    assert {r.event_id for r in read_seen_dedup(spark, path).collect()} == before


def test_first_batch_tolerates_preexisting_empty_dir(spark, tmp_path):
    """Round-4 regression: the registered query pre-creates the corpus dir
    (tempfile.mkdtemp), so batch 0 reads an existing-but-EMPTY dir and gets
    UNABLE_TO_INFER_SCHEMA instead of PATH_NOT_FOUND. Both shapes must be
    treated as 'no committed corpus' — but a dir with unreadable content
    must still raise."""
    path = str(tmp_path / "pre_created")
    import os

    os.makedirs(path)  # exists, empty — the mkdtemp shape
    b0 = spark.createDataFrame(
        [(1, 10, "view", 1.0), (2, 10, "view", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    )
    merge_seen_dedup(b0, 0, path, CONTENT, "event_id")
    assert {r.event_id for r in read_seen_dedup(spark, path).collect()} == {1}

    # a NON-empty dir that still can't be read as parquet must raise
    # (footer errors may surface as SparkException or AnalysisException
    # depending on the inference path — either way, not swallowed)
    import pytest

    bad = str(tmp_path / "bad_corpus")
    os.makedirs(bad)
    with open(os.path.join(bad, "junk.txt"), "w") as f:
        f.write("not parquet")
    with pytest.raises(Exception):
        merge_seen_dedup(b0, 1, bad, CONTENT, "event_id")


def test_null_position_does_not_collide_digests(spark, tmp_path):
    """concat_ws would drop NULL columns, colliding ("a", NULL, 1.0) with
    (NULL, "a", 1.0)-style rows; the prefix-coded digest must keep every
    NULL-position-distinct row, while true duplicates (same NULLs) dedup."""
    path = str(tmp_path / "corpus_nulls")
    schema = "event_id long, user_id long, event_type string, value double"
    b0 = spark.createDataFrame(
        [
            (1, None, "x", 1.0),   # null in col 1
            (2, 7, None, 1.0),     # null in col 2 — distinct from row 1
            (3, 7, "x", None),     # null in col 3
            (4, 7, "x", None),     # true duplicate of row 3
        ],
        schema,
    )
    merge_seen_dedup(b0, 0, path, CONTENT, "event_id")
    got = {r.event_id for r in read_seen_dedup(spark, path).collect()}
    assert got == {1, 2, 3}


def test_empty_first_batch_leaves_recoverable_corpus(spark, tmp_path):
    """An EMPTY batch 0 commits only _SUCCESS (no partition dirs, no
    parquet) — the next batch's corpus read raises UNABLE_TO_INFER_SCHEMA
    over a non-empty dir, which must still count as 'no corpus yet'
    (committer artifacts are not data), not kill the stream."""
    path = str(tmp_path / "corpus_empty_b0")
    schema = "event_id long, user_id long, event_type string, value double"
    empty = spark.createDataFrame([], schema)
    merge_seen_dedup(empty, 0, path, CONTENT, "event_id")
    import os

    assert os.path.isdir(path)  # committed, artifacts only

    b1 = spark.createDataFrame(
        [(5, 20, "view", 3.0), (6, 20, "view", 3.0)], schema
    )
    merge_seen_dedup(b1, 1, path, CONTENT, "event_id")
    assert {r.event_id for r in read_seen_dedup(spark, path).collect()} == {5}


def test_cross_batch_duplicate_loses_to_earlier_copy(spark, tmp_path):
    path = str(tmp_path / "corpus2")
    b0 = spark.createDataFrame(
        [(1, 10, "view", 1.0), (2, 10, "click", 2.0)],
        "event_id long, user_id long, event_type string, value double",
    )
    b1 = spark.createDataFrame(
        [(3, 10, "view", 1.0), (4, 11, "view", 1.0)],  # 3 duplicates 1
        "event_id long, user_id long, event_type string, value double",
    )
    merge_seen_dedup(b0, 0, path, CONTENT, "event_id")
    merge_seen_dedup(b1, 1, path, CONTENT, "event_id")
    got = {r.event_id for r in read_seen_dedup(spark, path).collect()}
    assert got == {1, 2, 4}


def test_dedup_sink_survives_checkpoint_restart(spark, tmp_path):
    """The streaming contract end-to-end: restart from checkpoint reads only
    NEW files, and first-seen-wins holds across the restart boundary (a
    duplicate arriving after the restart still loses to the pre-restart
    copy)."""
    from transilien_api_etl_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", *CONTENT
    )
    half_a = e.filter(F.col("event_id") % 2 == 0)
    # half_b: fresh ids, but HALF its content duplicates half_a's content
    dup_content = half_a.limit(100).select(*CONTENT)
    half_b = (
        e.filter(F.col("event_id") % 2 == 1)
        .limit(100)
        .select(*CONTENT)
        .unionByName(dup_content)
        .withColumn("event_id", F.monotonically_increasing_id() + 10_000_000)
        .select("event_id", *CONTENT)
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "corpus")
    schema = e.schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_seen_dedup(df, bid, out, CONTENT, "event_id")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    half_a.repartition(2).write.mode("append").parquet(src)
    start().awaitTermination()
    n1 = read_seen_dedup(spark, out).count()
    assert n1 == half_a.select(*CONTENT).distinct().count()

    half_b.repartition(2).write.mode("append").parquet(src)
    start().awaitTermination()

    final = read_seen_dedup(spark, out)
    # the corpus holds exactly the distinct content of everything streamed
    expected = (
        half_a.select(*CONTENT)
        .unionByName(half_b.select(*CONTENT))
        .distinct()
        .count()
    )
    assert final.count() == expected
    # the duplicated content kept its ORIGINAL (pre-restart) event ids
    kept_ids = {r.event_id for r in final.join(
        dup_content, CONTENT, "left_semi"
    ).collect()}
    assert kept_ids and all(i < 10_000_000 for i in kept_ids)
