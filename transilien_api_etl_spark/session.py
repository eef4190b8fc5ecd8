"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen to also be the right call on a 1000-executor cluster:

- AQE on (runtime join-strategy switches, partition coalescing, skew-join
  splitting) — the main defence against skew/cardinality misestimates at
  100 TB.
- Arrow on — every Python-boundary crossing (pandas_udf / applyInPandas /
  mapInPandas / toPandas) is Arrow-batched, never row-at-a-time pickle.
- Session timezone pinned to UTC — test data is tz-naive; pinning makes
  timestamp semantics deterministic and oracle (DuckDB) comparable.
- shuffle.partitions sized to the core count locally; at cluster scale this
  should be ~2-3× total cores — AQE coalescing makes over-provisioning cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "transilien-api-etl-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_query_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable confs every registry query depends on.

    The driver hands us an externally built session; these are the confs that
    MUST hold for oracle parity (timezone) and performance (AQE, Arrow), and
    they are all runtime-mutable, so we pin them defensively per query.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
