"""Z-order layout: the Morton key must actually interleave (locality in
both dimensions), and the clustered files must let BOTH columns prune —
the property a 1-D sort cannot give the second column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.layout import write_z_clustered, z_value


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    return ranges


def test_z_value_interleaves_correctly(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", z_value(F.col("a"), F.col("b"), 4).alias("z")).collect()
    }
    # reference: interleave bits, a on even positions, b on odd
    def ref(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): ref(a, b) for (a, b) in [(0, 0), (1, 0), (0, 1), (3, 5)]}


def test_z_clustered_files_prune_on_both_dimensions(spark, tmp_path):
    n = 1 << 14  # 16k points on a 128x128 grid, uniformly
    df = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(128))).cast("int").alias("a"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(128))).cast("int").alias("b"),
    )
    out = str(tmp_path / "z")
    write_z_clustered(df, out, "a", "b", n_files=16, bits=7)

    total = len(glob.glob(f"{out}/part-*.parquet"))
    assert total >= 8

    # a narrow predicate on EACH dimension must exclude a decent share of
    # files by footer range alone (with a 1-D sort on `a`, `b`'s ranges
    # would all span the full domain and prune nothing)
    for col in ("a", "b"):
        ranges = _file_ranges(out, col)
        overlapping = sum(1 for lo, hi in ranges if lo <= 10 and hi >= 0)
        assert overlapping < total, f"{col}: no file pruned ({ranges})"
        pruned_share = 1 - overlapping / total
        assert pruned_share >= 0.25, (
            f"{col}: only {pruned_share:.0%} of files pruned for a 0-10 range; "
            f"ranges={sorted(ranges)[:6]}..."
        )
