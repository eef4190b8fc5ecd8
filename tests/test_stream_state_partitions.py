"""Unit tests for streaming/jobs._bounded_state_partitions — the guard
that pins the state-store partition count (= spark.sql.shuffle.partitions
at first checkpoint) to the core count for the duration of a stream run.

The driver's harness hands us a session at the 200 default; without the
guard every stateful twin spins up 200 state-store instances (measured
13-29 s per query at sf0.01; ~2-4 s with it — see QUERIES.md).
"""

from __future__ import annotations

from transilien_api_etl_spark.streaming.jobs import _bounded_state_partitions

KEY = "spark.sql.shuffle.partitions"


def test_guard_shrinks_and_restores(spark):
    prev = spark.conf.get(KEY)
    try:
        spark.conf.set(KEY, "200")
        cores = spark.sparkContext.defaultParallelism
        with _bounded_state_partitions(spark):
            assert int(spark.conf.get(KEY)) == max(cores, 8)
        assert spark.conf.get(KEY) == "200"  # caller's value restored
    finally:
        spark.conf.set(KEY, prev)


def test_guard_never_raises_a_small_setting(spark):
    """A caller who sized the conf DOWN (or to cores) keeps their value —
    the guard only ever shrinks toward defaultParallelism."""
    prev = spark.conf.get(KEY)
    try:
        small = "4"
        spark.conf.set(KEY, small)
        with _bounded_state_partitions(spark):
            assert spark.conf.get(KEY) == small
        assert spark.conf.get(KEY) == small
    finally:
        spark.conf.set(KEY, prev)


def test_guard_restores_on_exception(spark):
    prev = spark.conf.get(KEY)
    try:
        spark.conf.set(KEY, "200")
        try:
            with _bounded_state_partitions(spark):
                raise RuntimeError("stream crashed")
        except RuntimeError:
            pass
        assert spark.conf.get(KEY) == "200"
    finally:
        spark.conf.set(KEY, prev)
