"""S4 JDBC source/sink exercised end-to-end against the embedded Derby
engine PySpark ships (derby*.jar on the default classpath) — write → read
round-trip, range-partitioned parallel read, and predicate pushdown
asserted in the physical plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from transilien_api_etl_spark.sources.sinks import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_jdbc_roundtrip_partitioned_read_and_pushdown(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    src = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    write_jdbc(src, url, "people", mode="overwrite", driver=DRIVER)

    # plain read round-trips every row
    back = read_jdbc(spark, url, "people", driver=DRIVER)
    assert back.count() == 1000
    assert {r.val for r in back.filter(F.col("k") < 3).collect()} == {"v0", "v1", "v2"}

    # range-partitioned parallel read: same data, sliced into 4 range scans
    par = read_jdbc(
        spark,
        url,
        "people",
        partition_column="k",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
        driver=DRIVER,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 1000

    # predicate + projection push into the JDBC scan, not a post-filter:
    # the plan's generated SQL must carry both the WHERE and the 2-col SELECT
    q = par.filter(F.col("k") >= 990).select("k", "grp")
    plan = _plan_of(q).replace('"', "")
    assert "(k >= 990)" in plan, plan
    assert "SELECT k,grp FROM people" in plan, plan
    assert q.count() == 10

    # append mode adds rows; overwrite replaces
    write_jdbc(src.limit(5), url, "people", mode="append", driver=DRIVER)
    assert read_jdbc(spark, url, "people", driver=DRIVER).count() == 1005
    write_jdbc(src.limit(5), url, "people", mode="overwrite", driver=DRIVER)
    assert read_jdbc(spark, url, "people", driver=DRIVER).count() == 5


def test_streaming_jdbc_sink_exactly_once(spark, tmp_path):
    import os

    from transilien_api_etl_spark.sources.sinks import jdbc_exactly_once_sink

    url = f"jdbc:derby:{tmp_path}/derbystream;create=true"
    src_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(500)], "k long, val string"
    ).write.parquet(src_dir)
    sink = jdbc_exactly_once_sink(url, "events_sink", DRIVER)
    q = (
        spark.readStream.schema("k long, val string")
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    back = read_jdbc(spark, url, "events_sink", driver=DRIVER)
    assert back.count() == 500

    # Crash-replay simulation: the SAME batch id is delivered again — the
    # audit table must make it a no-op, not a double insert.
    replay = spark.createDataFrame([(9999, "dup")], "k long, val string")
    sink(replay, 0)
    assert read_jdbc(spark, url, "events_sink", driver=DRIVER).count() == 500
    # A genuinely new batch id still lands.
    sink(replay, 1)
    assert read_jdbc(spark, url, "events_sink", driver=DRIVER).count() == 501
