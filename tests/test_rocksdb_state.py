"""RocksDB state store (SURVEY §3 T5-T7 scale posture): at 100 TB the
streaming state (dedup keys, session buffers) exceeds executor heap, so the
spillable RocksDB provider is the production configuration. This proves the
provider works in-container and that results are provider-invariant."""

from __future__ import annotations

import os
import tempfile

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _run_dedup(spark, provider: str | None):
    prev = spark.conf.get(PROVIDER_KEY)
    if provider:
        spark.conf.set(PROVIDER_KEY, provider)
    try:
        d = tempfile.mkdtemp(prefix="rocksdb-state-")
        src = os.path.join(d, "in")
        spark.createDataFrame(
            [(i % 97, i % 7, float(i)) for i in range(5000)],
            "k int, g int, v double",
        ).write.parquet(src)
        s = spark.readStream.schema("k int, g int, v double").parquet(src)
        name = f"dedup_{'rocks' if provider else 'hdfs'}"
        q = (
            s.dropDuplicates(["k", "g"])
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        progress = q.lastProgress
        rows = sorted(
            tuple(r) for r in spark.sql(f"select k, g from {name}").collect()
        )
        return rows, progress
    finally:
        spark.conf.set(PROVIDER_KEY, prev)


def test_rocksdb_provider_matches_default(spark):
    rocks_rows, rocks_prog = _run_dedup(spark, ROCKSDB)
    hdfs_rows, _ = _run_dedup(spark, None)
    assert rocks_rows == hdfs_rows
    assert len(rocks_rows) == 97 * 7
    # Prove RocksDB actually served the state: its custom metrics are
    # rocksdb*-prefixed in the stateOperators progress block.
    metrics = rocks_prog["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in metrics)
