"""Task-failure resilience: a task that dies on its first attempt must be
retried by the scheduler and produce exactly-once-correct results — the
everyday failure mode on a 1000-executor cluster (preemption, OOM-kill).
Plain `local[n]` runs with task retries disabled, so the scenario runs in a
subprocess on a `local[4,3]` master (3 attempts per task)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark import TaskContext
    from pyspark.sql import SparkSession
    import pandas as pd

    spark = (
        SparkSession.builder.master("local[4,3]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, 1000, 1, 4)

    def flaky(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"], "double": pdf["id"] * 2})

    out = df.mapInPandas(flaky, "id long, double long")
    total = out.groupBy().sum("double").collect()[0][0]
    n = out.count()
    assert n == 1000, n
    assert total == 2 * sum(range(1000)), total
    print("RETRY-OK", n, total)
    spark.stop()
    """
)


def test_first_attempt_failure_is_retried_with_correct_results():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY-OK 1000 999000" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )
