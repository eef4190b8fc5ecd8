"""materialize_small — the guarded materialize-then-clean helper (VERDICT
r5 task 6): sink-backed queries round-trip their FINAL small result through
the driver so per-run staging dirs can be deleted; the row cap is what
keeps a future query edit from silently collecting a large distributed
result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import materialize_small


def test_small_result_round_trips_values_and_schema(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("twice")
    )
    out = materialize_small(df)
    assert out.schema == df.schema
    assert sorted(r.twice for r in out.collect()) == [2 * i for i in range(100)]


def test_over_cap_raises_instead_of_collecting(spark):
    df = spark.range(50)
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        materialize_small(df, max_rows=10)


def test_empty_result_keeps_schema(spark):
    df = spark.range(10).filter(F.col("id") < 0)
    out = materialize_small(df)
    assert out.count() == 0
    assert out.schema == df.schema


def test_cached_row_count_scans_once_per_dir_table(spark, monkeypatch):
    """ADVICE r7: the corpus-size path switches (PQ Arrow threshold,
    SemDeDup derived k) must not pay a count() scan per query invocation
    — the count is memoized per (sf_dir, table) for the process life,
    which is safe because every sf_dir this repo reads is immutable once
    materialized (a scale-factor change changes the directory NAME)."""
    from transilien_api_etl_spark import io as io_mod

    calls = {"n": 0}
    real_load = io_mod.load_table

    def counting_load(spark_, sf_dir, name):
        calls["n"] += 1
        return real_load(spark_, sf_dir, name)

    monkeypatch.setattr(io_mod, "load_table", counting_load)
    io_mod._ROW_COUNT_CACHE.clear()
    n1 = io_mod.cached_row_count(spark, "/root/testdata/sf0.001", "embeddings")
    n2 = io_mod.cached_row_count(spark, "/root/testdata/sf0.001", "embeddings")
    # trailing-slash spelling of the same dir must hit the same entry
    n3 = io_mod.cached_row_count(spark, "/root/testdata/sf0.001/", "embeddings")
    assert n1 == n2 == n3 > 0
    assert calls["n"] == 1
    # a different table is a different entry
    io_mod.cached_row_count(spark, "/root/testdata/sf0.001", "documents")
    assert calls["n"] == 2


def test_cached_query_embedding_scans_once_and_matches_table(spark, monkeypatch):
    """Round 9: the kNN queries' query vector (embedding of vec_id 0) is a
    request parameter derived from the table — memoized per (dir, vec_id,
    mtime) so driver-side ANN queries don't pay a scan-job per invocation.
    The cached value must be exactly the table's row, and an absent vec_id
    must return None (callers emit the oracle-equivalent empty result)."""
    from pyspark.sql import functions as F

    from transilien_api_etl_spark import io as io_mod

    sf = "/root/testdata/sf0.001"
    expected = [
        float(x)
        for x in io_mod.load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]

    calls = {"n": 0}
    real_load = io_mod.load_table

    def counting_load(spark_, sf_dir, name):
        calls["n"] += 1
        return real_load(spark_, sf_dir, name)

    monkeypatch.setattr(io_mod, "load_table", counting_load)
    io_mod._QUERY_VEC_CACHE.clear()
    v1 = io_mod.cached_query_embedding(spark, sf, vec_id=0)
    v2 = io_mod.cached_query_embedding(spark, sf + "/", vec_id=0)
    assert v1 == v2 == expected
    assert calls["n"] == 1
    assert io_mod.cached_query_embedding(spark, sf, vec_id=-12345) is None


def test_in_place_rewrite_of_dir_table_misses_memo(spark, tmp_path):
    """VERDICT r9 task 6: a parquet DIRECTORY's own mtime does not change
    when a file inside it is rewritten in place (POSIX bumps dir mtime on
    entry add/remove/rename only), so a freshness token derived from the
    dir stat alone would serve a stale memoized count after a scale-cache
    part file is overwritten same-named. The token must move even when
    BOTH the dir's and the inner file's mtimes are pinned back to their
    pre-rewrite values (the same-second-rewrite case): file count + total
    bytes + max file mtime catches it via the size component."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from transilien_api_etl_spark import io as io_mod

    sf = str(tmp_path)
    table_dir = tmp_path / "region.parquet"
    table_dir.mkdir()
    part = table_dir / "part-0.parquet"

    def write_rows(n):
        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array(range(n), pa.int32()),
                    "r_name": pa.array([f"R{i}" for i in range(n)]),
                    "r_comment": pa.array(["x"] * n),
                }
            ),
            part,
        )

    write_rows(100)
    dir_stat = os.stat(table_dir)
    file_stat = os.stat(part)
    io_mod._ROW_COUNT_CACHE.clear()
    assert io_mod.cached_row_count(spark, sf, "region") == 100

    write_rows(37)  # in-place rewrite, same file name
    # Adversarial clock: pin both mtimes back to the pre-rewrite values.
    os.utime(part, ns=(file_stat.st_atime_ns, file_stat.st_mtime_ns))
    os.utime(table_dir, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    assert io_mod.cached_row_count(spark, sf, "region") == 37


def test_unreadable_dir_token_always_misses(tmp_path, monkeypatch):
    """The fail-open branch (VERDICT r10 task 6a): an unreadable directory
    table must yield a FRESH token on every call — a permanent cache miss,
    never a stale hit — and the token must not collide with any readable
    dir's (count, total, max_mtime) shape (count/total are never -1).
    scandir is monkeypatched to fail (chmod 000 is moot under root, which
    bypasses mode bits)."""
    import os

    from transilien_api_etl_spark import io as io_mod

    table_dir = tmp_path / "region.parquet"
    table_dir.mkdir()
    (table_dir / "part-0.parquet").write_bytes(b"x")

    real_scandir = os.scandir

    def denied(path):
        if str(path) == str(table_dir):
            raise PermissionError(13, "Permission denied", str(path))
        return real_scandir(path)

    monkeypatch.setattr(io_mod.os, "scandir", denied)
    t1 = io_mod._table_mtime(str(tmp_path), "region")
    t2 = io_mod._table_mtime(str(tmp_path), "region")
    assert len(t1) == len(t2) == 3
    assert t1[:2] == t2[:2] == (-1, -1)
    assert t1 != t2  # monotonic component: every call misses

    monkeypatch.setattr(io_mod.os, "scandir", real_scandir)
    readable = io_mod._table_mtime(str(tmp_path), "region")
    assert len(readable) == 3 and readable[0] == 1  # one part file
