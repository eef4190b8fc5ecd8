"""Streaming building blocks (SURVEY.md §3.9 T1-T8).

``read_events_stream`` is the micro-batch ingest (T1): a file source over
the events parquet with the declared schema — in production the same plan
hangs off a Kafka/HTTP-polling source; the logical plan downstream is
identical, which is the point of Structured Streaming.

``run_stream_to_memory`` drives any streaming DataFrame to completion with
``availableNow`` and returns the materialized result — deterministic, so
streaming plans share the batch plans' DuckDB oracles (SURVEY §6.3).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from transilien_api_etl_spark.io import events_raw_schema, table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (T1).

    ts may arrive as parquet TIMESTAMP(NANOS) (nanosAsLong + integer-DIV
    conversion, same as the batch loader) or standard µs — one footer read
    decides, so batch and stream share one downstream schema either way.
    The events table itself may be a single ``events.parquet`` FILE (the
    driver-generated testdata) or a Spark-written DIRECTORY of part files
    (the scale cache, any sink of this engine): a leaf-name glob filter
    only handles the former — ``part-*.parquet`` never matches
    ``events.parquet`` — so the directory case streams the dir itself
    (silent-zero-rows otherwise).
    """
    from transilien_api_etl_spark.io import SCHEMAS, _events_ns_to_ts, _events_ts_is_nanos

    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        src, opts = path, {}
    else:
        # file streaming source requires a directory; select just the
        # events file out of it with pathGlobFilter
        src, opts = sf_dir, {"pathGlobFilter": "events.parquet"}
    if _events_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(events_raw_schema())
        for k, v in opts.items():
            reader = reader.option(k, v)
        return _events_ns_to_ts(reader.parquet(src))
    reader = spark.readStream.schema(SCHEMAS["events"])
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.parquet(src)


class _bounded_state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` to the session's core count for
    the duration of a stream run, restoring the caller's value afterwards.

    Stateful streaming fixes its state-store partition count from this conf
    at FIRST checkpoint (AQE never re-coalesces stateful streams), so a
    driver session left at the 200 default spins up 200 state-store
    instances per query — 25× the cores on the test harness, and the
    dominant cost of the stream-stream-join twins at sf0.01 (~29 s → ~3 s).
    Every helper below creates a FRESH checkpoint, so re-pinning per run is
    always legal. On a real cluster callers size the conf themselves before
    the first start; this guard only ever shrinks toward defaultParallelism.

    NOT reentrant/thread-safe: the conf is session-global, so two
    overlapping guards on one session can restore in the wrong order and
    leave the shrunk value behind (and a concurrent batch query on another
    thread shuffles at the shrunk width while a guard is open). The
    helpers below run streams to completion before returning, so the
    driver/test posture is serial by construction; callers running
    streams concurrently should pin the conf once at session build
    instead of relying on this guard.
    """

    KEY = "spark.sql.shuffle.partitions"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get(self.KEY, None)
        cores = self.spark.sparkContext.defaultParallelism
        target = max(cores, 8)
        if self.prev is None or int(self.prev) > target:
            self.spark.conf.set(self.KEY, str(target))

    def __exit__(self, *exc) -> None:
        if self.prev is not None:
            self.spark.conf.set(self.KEY, self.prev)
        else:  # pragma: no cover - conf always has a default
            self.spark.conf.unset(self.KEY)


def run_stream_to_memory(
    sdf: DataFrame, output_mode: str, name_prefix: str = "stream"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; returns the materialized result as a batch DataFrame."""
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    try:
        with _bounded_state_partitions(sdf.sparkSession):
            q = (
                sdf.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # per-run throwaway checkpoint (offsets + state store): a bench or
        # test session starts dozens of streams, and the RocksDB/HDFS state
        # files would otherwise pile up in /tmp until the OS sweeps it
        shutil.rmtree(ckpt, ignore_errors=True)
    return sdf.sparkSession.table(qname)


def run_stream_foreach_batch(
    sdf: DataFrame, batch_fn, name_prefix: str = "febatch"
) -> None:
    """Drive a stream through a foreachBatch sink to completion (S5/T1)."""
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    try:
        with _bounded_state_partitions(sdf.sparkSession):
            q = (
                sdf.writeStream.foreachBatch(batch_fn)
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


SESSION_GAP_MS = 1_800_000  # 30 minutes


def sessionize_with_timeout(sdf: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Custom event-time sessionizer (T7 with timers): buffer-until-watermark.

    ``sdf`` is a WATERMARKED streaming DataFrame with (user_id, ts,
    event_id). Per-user state buffers pending events; on every invocation
    (new data OR event-time timer) the buffer is gap-split and every
    session whose last event sits more than ``gap_ms`` behind the
    watermark is emitted (append-mode, exactly once) and dropped; the rest
    stays buffered with a timer at the earliest possible next flush.
    Buffering until the watermark proves a session cannot grow is what
    makes the operator correct under cross-batch event reordering — an
    eager gap-tracker would mis-split on any out-of-order arrival.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_ms * 1000

    def sessions(key, batches, state: GroupState):
        ts_buf, eid_buf = state.get if state.exists else ((), ())
        ts_buf, eid_buf = list(ts_buf), list(eid_buf)
        # buffer in MICROseconds: the source carries µs precision and the
        # emitted session bounds must be bit-equal to the batch oracle's
        for pdf in batches:
            if len(pdf):
                ts_buf.extend(pdf["ts"].astype("datetime64[us]").astype("int64"))
                eid_buf.extend(pdf["event_id"].astype("int64"))
        wm_us = state.getCurrentWatermarkMs() * 1000
        order = sorted(range(len(ts_buf)), key=lambda i: (ts_buf[i], eid_buf[i]))
        ts_sorted = [int(ts_buf[i]) for i in order]
        eid_sorted = [int(eid_buf[i]) for i in order]
        sess: list[tuple[int, int, int]] = []  # (start_us, last_us, n)
        for t in ts_sorted:
            if sess and t - sess[-1][1] <= gap_us:
                st, _, n = sess[-1]
                sess[-1] = (st, t, n + 1)
            else:
                sess.append((t, t, 1))
        closed = [x for x in sess if x[1] + gap_us < wm_us]
        keep_from = sum(x[2] for x in closed)  # sessions are prefix-ordered
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(closed),
                    "session_start": [pd.to_datetime(a, unit="us") for a, _, _ in closed],
                    "session_last": [pd.to_datetime(b, unit="us") for _, b, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )
        rest_ts = ts_sorted[keep_from:]
        rest_eid = eid_sorted[keep_from:]
        if rest_ts:
            state.update((rest_ts, rest_eid))
            # earliest instant (ms) the oldest retained session could flush;
            # must stay strictly ahead of the current watermark
            state.setTimeoutTimestamp(
                max((rest_ts[0] + gap_us) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()

    return (
        sdf.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessions,
            "user_id long, session_start timestamp, session_last timestamp, n_events long",
            "ts array<long>, eid array<long>",
            "Append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
