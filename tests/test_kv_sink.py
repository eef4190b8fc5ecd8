"""Transactional KV sink: commit protocol (manifest lists exactly the
job's staged files), append vs overwrite modes, and invisibility of
orphaned staging files to the manifest-resolved reader."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.sources.kv_sink import (
    MANIFEST,
    STAGING,
    read_kv_sink,
    register_kv_sink,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "n_nationkey int, n_name string"


def test_write_commit_read_roundtrip_and_orphan_invisibility(spark, tmp_path):
    register_kv_sink(spark)
    out = str(tmp_path / "kv")
    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")

    nation.repartition(4).write.format("kv_jsonl").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, MANIFEST)))
    assert len(manifest["files"]) == 4
    assert sum(e["rows"] for e in manifest["files"]) == 25

    # an orphaned staging file (failed/in-flight job) must be invisible
    orphan = os.path.join(out, STAGING, "deadbeef_orphan.jsonl")
    with open(orphan, "w") as f:
        f.write('{"n_nationkey": 999, "n_name": "GHOST"}\n')

    back = read_kv_sink(spark, out, SCHEMA)
    assert back.count() == 25
    assert back.filter(F.col("n_nationkey") == 999).count() == 0
    assert {r.n_name for r in back.collect()} == {r.n_name for r in nation.collect()}


def test_append_extends_and_overwrite_replaces(spark, tmp_path):
    register_kv_sink(spark)
    out = str(tmp_path / "kv2")
    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")

    nation.write.format("kv_jsonl").option("path", out).mode("append").save()
    nation.write.format("kv_jsonl").option("path", out).mode("append").save()
    assert read_kv_sink(spark, out, SCHEMA).count() == 50  # append extends

    nation.write.format("kv_jsonl").option("path", out).mode("overwrite").save()
    assert read_kv_sink(spark, out, SCHEMA).count() == 25  # overwrite replaces
