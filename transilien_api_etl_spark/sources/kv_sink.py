"""Transactional key-value sink as a Python DataSource writer (SURVEY §3.1
S5 — the reference's Dynamo ``batch_write`` leg, re-expressed with Spark's
commit protocol instead of fire-and-forget puts).

Write path semantics (the lesson this module exists to teach):

- executors stage partition outputs under ``_staging/<uuid>.jsonl`` and
  return a WriterCommitMessage naming the file — no global state, no
  coordination;
- the DRIVER commits by writing a ``_manifest.json`` that lists exactly
  the staged files of THIS job (atomic rename), so readers see the whole
  job's output or none of it;
- on task retry / job abort the orphaned staging files are never listed —
  ``read_kv_sink`` resolves the manifest, not the directory, so partial
  writes are invisible (the exactly-once property the reference's
  key-overwrite idempotency only approximates).

``mode("append")`` extends the manifest; ``mode("overwrite")`` replaces
it. At 100 TB the per-partition staging file becomes an object-store
multipart upload and the manifest a metastore/Delta-log entry — the
protocol shape is identical.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_manifest.json"
STAGING = "_staging"


class KvCommitMessage(WriterCommitMessage):
    def __init__(self, rel_path: str, n_rows: int):
        self.rel_path = rel_path
        self.n_rows = n_rows


class KvSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> KvCommitMessage:
        """Executor-side: stage this partition's rows as one jsonl file."""
        rel = os.path.join(STAGING, f"{uuid.uuid4().hex}.jsonl")
        full = os.path.join(self.path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(dict(zip(self.columns, row)), default=str) + "\n")
                n += 1
        return KvCommitMessage(rel, n)

    def commit(self, messages) -> None:
        """Driver-side: publish exactly this job's staged files, atomically."""
        entries = [
            {"file": m.rel_path, "rows": m.n_rows} for m in messages if m is not None
        ]
        manifest_path = os.path.join(self.path, MANIFEST)
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                entries = json.load(f)["files"] + entries
        tmp = manifest_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"columns": self.columns, "files": entries}, f)
        os.replace(tmp, manifest_path)  # atomic publish

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.rel_path))
                except OSError:
                    pass


class KvJsonlDataSource(DataSource):
    """``df.write.format("kv_jsonl").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "kv_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> KvSinkWriter:
        return KvSinkWriter(self.options, schema, overwrite)


def register_kv_sink(spark: SparkSession) -> None:
    spark.dataSource.register(KvJsonlDataSource)


def read_kv_sink(spark: SparkSession, path: str, schema: str | StructType) -> DataFrame:
    """Manifest-resolved read: only files the manifest lists exist for the
    reader — orphaned staging files from failed/in-flight jobs are invisible."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    files = [os.path.join(path, e["file"]) for e in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
