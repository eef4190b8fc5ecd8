"""Warehouse-grade sink semantics: bucketed co-located joins (shuffle
elimination — the 100 TB lever) and SCD2 history merges."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.operators.scd import as_of_view, current_view, scd2_merge
from transilien_api_etl_spark.sources.sinks import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/bucketdb'")
    o = load_table(spark, SF, "orders")
    l = load_table(spark, SF, "lineitem")
    write_bucketed(o, "bucketdb.orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(l, "bucketdb.lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])

    ob, lb = read_table(spark, "bucketdb.orders_b"), read_table(spark, "bucketdb.lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select("o_orderkey", "l_quantity")
    # at sf0.001 the optimizer would (rightly) broadcast; disable it so the
    # plan shows what buckets buy at fact×fact scale: an SMJ with NO exchange
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan}"
    )
    # and it is correct
    expected = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert joined.count() == expected
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_scd2_merge_versions_and_views(spark):
    day1 = spark.createDataFrame(
        [("s1", "Gare du Nord", "2026-01-01 00:00:00"), ("s2", "Enghien", "2026-01-01 00:00:00")],
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    hist = scd2_merge(None, day1, ["stop_id"], ["stop_name"], "observed")
    assert hist.count() == 2

    # day 2: s1 renamed, s2 unchanged, s3 new
    day2 = spark.createDataFrame(
        [
            ("s1", "Paris Nord", "2026-02-01 00:00:00"),
            ("s2", "Enghien", "2026-02-01 00:00:00"),
            ("s3", "Pontoise", "2026-02-01 00:00:00"),
        ],
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    hist2 = scd2_merge(hist, day2, ["stop_id"], ["stop_name"], "observed")

    rows = {(r.stop_id, r.stop_name): (str(r.valid_from), str(r.valid_to)) for r in hist2.collect()}
    assert len(rows) == 4  # s1 old + s1 new + s2 (untouched) + s3
    assert rows[("s1", "Gare du Nord")] == ("2026-01-01 00:00:00", "2026-02-01 00:00:00")
    assert rows[("s1", "Paris Nord")][1] == "9999-12-31 00:00:00"
    assert rows[("s2", "Enghien")] == ("2026-01-01 00:00:00", "9999-12-31 00:00:00")

    cur = {r.stop_id: r.stop_name for r in current_view(hist2).collect()}
    assert cur == {"s1": "Paris Nord", "s2": "Enghien", "s3": "Pontoise"}

    asof = {r.stop_id: r.stop_name for r in as_of_view(hist2, "2026-01-15 00:00:00").collect()}
    assert asof == {"s1": "Gare du Nord", "s2": "Enghien"}

    # idempotent: replaying day 2 adds nothing
    hist3 = scd2_merge(hist2, day2, ["stop_id"], ["stop_name"], "observed")
    assert hist3.count() == 4


def test_scd2_merge_multi_snapshot_batch(spark):
    # One batch carrying SEVERAL snapshots per key must sequence them:
    # versions chain valid_to = next valid_from, exactly one open version
    # per key, exact-duplicate and consecutive-unchanged snapshots collapse.
    base = spark.createDataFrame(
        [("s1", "Nord", "2026-01-01 00:00:00")],
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    hist = scd2_merge(None, base, ["stop_id"], ["stop_name"], "observed")

    batch = spark.createDataFrame(
        [
            ("s1", "Nord", "2026-02-01 00:00:00"),       # == open version: no new row
            ("s1", "Paris Nord", "2026-03-01 00:00:00"), # v2
            ("s1", "Paris Nord", "2026-03-15 00:00:00"), # unchanged vs v2: dropped
            ("s1", "Paris-Nord", "2026-04-01 00:00:00"), # v3
            ("s1", "Paris-Nord", "2026-04-01 00:00:00"), # exact dup: dropped
            ("s2", "A", "2026-01-10 00:00:00"),          # new key, v1
            ("s2", "B", "2026-01-20 00:00:00"),          # new key, v2
        ],
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    hist2 = scd2_merge(hist, batch, ["stop_id"], ["stop_name"], "observed")

    rows = {
        (r.stop_id, r.stop_name): (str(r.valid_from), str(r.valid_to))
        for r in hist2.collect()
    }
    assert hist2.count() == len(rows) == 5  # no duplicated closed rows
    assert rows[("s1", "Nord")] == ("2026-01-01 00:00:00", "2026-03-01 00:00:00")
    assert rows[("s1", "Paris Nord")] == ("2026-03-01 00:00:00", "2026-04-01 00:00:00")
    assert rows[("s1", "Paris-Nord")][1] == "9999-12-31 00:00:00"
    assert rows[("s2", "A")] == ("2026-01-10 00:00:00", "2026-01-20 00:00:00")
    assert rows[("s2", "B")][1] == "9999-12-31 00:00:00"
    # invariant: exactly one open version per key
    assert current_view(hist2).groupBy("stop_id").count().filter("count > 1").count() == 0


def test_range_clustered_layout_has_disjoint_file_ranges(spark, tmp_path):
    """write_range_clustered must produce files whose footer min/max ranges
    on the cluster key are pairwise disjoint — the property that lets a
    point/range predicate skip every non-matching file at scan time."""
    import glob

    import pyarrow.parquet as pq

    from transilien_api_etl_spark.sources.sinks import write_range_clustered

    ev = load_table(spark, SF, "events")
    out = str(tmp_path / "events_clustered")
    write_range_clustered(ev, out, ["ts"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns) if md.row_group(0).column(i).path_in_schema == "ts"
        )
        lo = min(md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 4, f"expected several clustered files, got {len(ranges)}"
    ranges.sort()
    for (_, prev_hi), (nxt_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi <= nxt_lo, f"overlapping file ranges: {ranges}"

    # and the filtered read must actually skip files: scanning a range that
    # fits one file reads fewer rows than the table
    lo0, hi0 = ranges[0]
    n = (
        spark.read.parquet(out)
        .filter(F.col("ts") <= F.lit(hi0))
        .count()
    )
    assert 0 < n < ev.count()


def test_point_in_time_join_picks_version_in_force(spark):
    """Feature-store correctness: each fact must see exactly the dimension
    version valid at its own instant — the new version AT the change
    boundary (half-open intervals), nulls before the entity existed,
    never a future version (leakage)."""
    from transilien_api_etl_spark.operators.scd import point_in_time_join, scd2_merge

    dim_v1 = spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], "cust_id long, tier string"
    ).withColumn("effective_ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    hist = scd2_merge(None, dim_v1, ["cust_id"], ["tier"], "effective_ts")
    dim_v2 = spark.createDataFrame([(1, "gold")], "cust_id long, tier string").withColumn(
        "effective_ts", F.lit("2026-01-10 00:00:00").cast("timestamp")
    )
    hist = scd2_merge(hist, dim_v2, ["cust_id"], ["tier"], "effective_ts")

    facts = spark.createDataFrame(
        [
            (100, 1, "2025-12-25 00:00:00"),  # before cust 1 existed
            (101, 1, "2026-01-05 00:00:00"),  # during bronze
            (102, 1, "2026-01-10 00:00:00"),  # AT the boundary → gold
            (103, 1, "2026-02-01 00:00:00"),  # open gold version
            (104, 2, "2026-03-01 00:00:00"),  # silver, never changed
        ],
        "fact_id long, cust_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    got = {
        r.fact_id: r.tier
        for r in point_in_time_join(facts, hist, ["cust_id"], "ts").collect()
    }
    assert got == {100: None, 101: "bronze", 102: "gold", 103: "gold", 104: "silver"}

    inner = point_in_time_join(facts, hist, ["cust_id"], "ts", how="inner")
    assert {r.fact_id for r in inner.collect()} == {101, 102, 103, 104}


def test_scd2_merge_rejects_out_of_order_batch(spark):
    """An incoming effective time BEFORE the open row's valid_from would
    invert the interval and make the open version vanish from every
    as-of query — the merge must raise, not corrupt (round-5 review)."""
    import pytest

    day1 = spark.createDataFrame(
        [("s1", "Nord", "2026-01-05 00:00:00")],
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    hist = scd2_merge(None, day1, ["stop_id"], ["stop_name"], "observed")
    late = spark.createDataFrame(
        [("s1", "Renamed", "2026-01-01 00:00:00")],  # precedes valid_from
        "stop_id string, stop_name string, observed string",
    ).withColumn("observed", F.col("observed").cast("timestamp"))
    with pytest.raises(Exception, match="out-of-order"):
        scd2_merge(hist, late, ["stop_id"], ["stop_name"], "observed").collect()


def test_point_in_time_join_respects_closed_history_tail(spark):
    """A fact dated after a key's LAST version's valid_to must get NULL
    attributes (left) / drop (inner), not the superseded version — the
    valid_to half of the interval predicate (round-5 review)."""
    from transilien_api_etl_spark.operators.scd import point_in_time_join

    hist = spark.createDataFrame(
        [("s1", "OldName", "2026-01-01 00:00:00", "2026-02-01 00:00:00")],
        "stop_id string, stop_name string, valid_from string, valid_to string",
    ).select(
        "stop_id",
        "stop_name",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [("s1", "2026-01-15 00:00:00"), ("s1", "2026-03-01 00:00:00")],
        "stop_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        str(r.ts): r.stop_name
        for r in point_in_time_join(facts, hist, ["stop_id"], "ts").collect()
    }
    assert out["2026-01-15 00:00:00"] == "OldName"  # in force at the time
    assert out["2026-03-01 00:00:00"] is None  # superseded, no leakage
    inner = point_in_time_join(facts, hist, ["stop_id"], "ts", how="inner")
    assert inner.count() == 1
