"""ACID MERGE sink (S5 upgraded): upsert/delete semantics, snapshot
isolation + time travel, file-level pruning (untouched files carried by
reference, never rewritten), and optimistic-concurrency conflict handling."""

from __future__ import annotations

import os
import tempfile

import pytest

from transilien_api_etl_spark.sources import lakehouse as lh


def _mk_table(spark, rows, tmp=None):
    table = tmp or tempfile.mkdtemp(prefix="lakehouse-")
    df = spark.createDataFrame(rows, "id long, name string, v double")
    # Two key-clustered files: ids 0-49 and 50-99 — the pruning fixture.
    low = df.where("id < 50").coalesce(1)
    high = df.where("id >= 50").coalesce(1)
    lh.create_table(spark, table, low, ["id"])
    snap = lh.load_snapshot(table)
    entries = lh._write_data_files(high, table, ["id"])
    lh._commit(table, 1, ["id"], list(snap.files) + entries)
    return table


@pytest.fixture
def table(spark):
    return _mk_table(
        spark, [(i, f"n{i}", float(i)) for i in range(100)]
    )


def test_merge_upsert_insert_delete(spark, table):
    src = spark.createDataFrame(
        [
            (3, "updated", 99.0, False),
            (200, "inserted", 1.0, False),
            (7, None, 0.0, True),  # delete id 7
        ],
        "id long, name string, v double, is_delete boolean",
    )
    snap = lh.merge_into(spark, table, src, delete_col="is_delete")
    got = {
        r["id"]: (r["name"], r["v"])
        for r in lh.read_table(spark, table).collect()
    }
    assert got[3] == ("updated", 99.0)
    assert got[200] == ("inserted", 1.0)
    assert 7 not in got
    assert got[42] == ("n42", 42.0)  # untouched row intact
    assert len(got) == 100  # 100 - 1 delete + 1 insert
    assert snap.version == 2


def test_time_travel_reads_pre_merge_snapshot(spark, table):
    v_before = lh.load_snapshot(table).version
    src = spark.createDataFrame([(3, "x", 0.0)], "id long, name string, v double")
    lh.merge_into(spark, table, src)
    old = lh.read_table(spark, table, version=v_before)
    assert {r["name"] for r in old.where("id = 3").collect()} == {"n3"}
    new = lh.read_table(spark, table)
    assert {r["name"] for r in new.where("id = 3").collect()} == {"x"}
    hist = lh.table_history(table)
    assert [h["version"] for h in hist] == list(range(v_before + 2))


def test_file_pruning_skips_out_of_range_files(spark, table):
    before = lh.load_snapshot(table)
    # All source keys < 50: the [50, 99] file must be carried by reference.
    src = spark.createDataFrame([(10, "u", 0.0)], "id long, name string, v double")
    after = lh.merge_into(spark, table, src)
    before_paths = {e["path"] for e in before.files}
    after_paths = {e["path"] for e in after.files}
    high_files = {e["path"] for e in before.files if e["min_key"] >= 50}
    low_files = before_paths - high_files
    assert high_files and high_files <= after_paths  # untouched, same file
    assert not (low_files & after_paths)  # touched file was rewritten
    # Data survives pruning decisions.
    assert lh.read_table(spark, table).count() == 100


def test_merge_rejects_duplicate_source_keys(spark, table):
    src = spark.createDataFrame(
        [(1, "a", 0.0), (1, "b", 0.0)], "id long, name string, v double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        lh.merge_into(spark, table, src)


def test_concurrent_commit_conflict_and_retry(spark, table):
    snap = lh.load_snapshot(table)
    # A rival writer publishes the next version directly.
    lh._commit(table, snap.version + 1, list(snap.key_cols), list(snap.files))
    # Direct single-attempt merge against the stale snapshot must conflict.
    src = spark.createDataFrame([(5, "z", 0.0)], "id long, name string, v double")
    with pytest.raises(lh.ConcurrentWriteError):
        lh._merge_once(spark, table, src, snap, None)
    # The retrying entry point re-reads the new snapshot and lands.
    out = lh.merge_into(spark, table, src)
    assert out.version == snap.version + 2
    got = lh.read_table(spark, table).where("id = 5").collect()
    assert got[0]["name"] == "z"


def test_aborted_writer_invisible_to_readers(spark, table):
    # Staged-but-uncommitted data files (a crashed writer) are never listed.
    n_before = lh.read_table(spark, table).count()
    orphan = spark.createDataFrame([(999, "ghost", 0.0)], "id long, name string, v double")
    lh._write_data_files(orphan, table, ["id"])  # stage without commit
    assert lh.read_table(spark, table).count() == n_before
