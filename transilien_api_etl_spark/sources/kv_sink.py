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
import time
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
LOCK = "_manifest.lock"


def _manifest_lock(path: str, timeout_s: float = 30.0):
    """Create-if-absent lock serializing manifest read-modify-write.

    Two concurrent APPEND jobs each read the manifest, add their own
    files, and publish — without mutual exclusion the second ``os.replace``
    silently erases the first job's entries even though both reported
    success (lost update). ``O_CREAT|O_EXCL`` is the local-FS analogue of
    the conditional PUT / metastore CAS the module docstring prescribes
    at object-store scale. A lock older than ``timeout_s`` is presumed
    abandoned by a crashed committer and broken."""
    lock = os.path.join(path, LOCK)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            return os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > timeout_s:
                    os.unlink(lock)  # stale: committer died mid-commit
                    continue
            except OSError:
                continue  # holder released (or broke) it — retry open
            if time.monotonic() > deadline:
                raise TimeoutError(f"manifest lock busy for >{timeout_s}s: {lock}")
            time.sleep(0.02)


def _release_manifest_lock(path: str, fd: int) -> None:
    os.close(fd)
    try:
        os.unlink(os.path.join(path, LOCK))
    except OSError:
        pass


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
        """Driver-side: publish exactly this job's staged files, atomically.

        The whole read-modify-write runs under the manifest lock so two
        concurrent append jobs compose instead of the later publish
        erasing the earlier job's entries (lost update)."""
        entries = [
            {"file": m.rel_path, "rows": m.n_rows} for m in messages if m is not None
        ]
        manifest_path = os.path.join(self.path, MANIFEST)
        fd = _manifest_lock(self.path)
        try:
            if not self.overwrite and os.path.exists(manifest_path):
                with open(manifest_path, encoding="utf-8") as f:
                    entries = json.load(f)["files"] + entries
            tmp = manifest_path + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"columns": self.columns, "files": entries}, f)
            os.replace(tmp, manifest_path)  # atomic publish
        finally:
            _release_manifest_lock(self.path, fd)

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


def vacuum_kv_sink(path: str, *, grace_s: float = 3600.0) -> list[str]:
    """Remove staging files the current manifest does not reference.

    Two populations accumulate otherwise unboundedly: generations
    superseded by ``mode("overwrite")`` (each snapshot publish leaves the
    previous one's jsonl on disk) and orphans from jobs that crashed
    between staging and commit. Files younger than ``grace_s`` are kept —
    they may belong to an in-flight job that has staged but not yet
    committed, or be mid-scan by a reader that resolved the previous
    manifest. Returns removed relative paths."""
    manifest_path = os.path.join(path, MANIFEST)
    staging_dir = os.path.join(path, STAGING)
    if not os.path.isdir(staging_dir):
        return []
    referenced: set[str] = set()
    if os.path.exists(manifest_path):
        with open(manifest_path, encoding="utf-8") as f:
            referenced = {e["file"] for e in json.load(f)["files"]}
    removed: list[str] = []
    now = time.time()
    for name in os.listdir(staging_dir):
        rel = os.path.join(STAGING, name)
        full = os.path.join(path, rel)
        if rel in referenced:
            continue
        try:
            if now - os.path.getmtime(full) < grace_s:
                continue
            os.remove(full)
            removed.append(rel)
        except OSError:
            continue  # raced with a concurrent writer/vacuum
    return removed


def read_kv_sink(spark: SparkSession, path: str, schema: str | StructType) -> DataFrame:
    """Manifest-resolved read: only files the manifest lists exist for the
    reader — orphaned staging files from failed/in-flight jobs are invisible."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    files = [os.path.join(path, e["file"]) for e in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
