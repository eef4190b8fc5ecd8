"""Compute-bound data amplifier for the benchmark (SURVEY §7 posture).

The sf0.1 bench inputs (600 k-row lineitem, 100 k-row events) are so small
that every Spark query is scheduling/codegen overhead, not plan cost — the
2× bar against an in-process engine is unmeasurable there. This module
materializes an N×-replicated copy of the fact tables (dimensions copied
verbatim — at 100 TB facts grow, dims don't), with the SAME table names and
file layout as a testdata sf dir, so that

- every registered query runs on it unchanged via ``io.load_table``, and
- every DuckDB oracle runs on it unchanged via parquet views,

giving a same-data Spark-vs-DuckDB comparison at a scale where the plan,
not the fixed overhead, is what is being timed.

Replication widens key spaces (replica index shifts the primary key by a
stride larger than any real key) and jitters event timestamps by a few
seconds per replica, so join fan-in, group-by cardinality, and session
shapes grow proportionally — the realistic 100 TB shape: more keys, not
hotter keys. Foreign keys into the un-replicated dimensions are left
untouched so star joins stay dim-broadcast + big-fact, exactly as they
would on a cluster.
"""

from __future__ import annotations

import os
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table

# Fact-table replication factors: ~60 M lineitem / 15 M orders / 10 M events
# / 1 M documents / 1 M embeddings from the sf0.1 inputs. Sized so that the
# slowest Spark query is seconds (plan cost dominates the ~0.2 s fixed
# overhead) while a full two-engine pass stays inside a per-round budget.
DEFAULT_FACTORS: dict[str, int] = {
    "lineitem": 100,
    "orders": 100,
    "events": 100,
    "documents": 200,
    "embeddings": 500,
}
UNSCALED = ("region", "nation", "customer", "supplier", "part")

# Added to each table's primary key per replica; > any generated key at any
# sf in the driver testdata, so replicated keys never collide.
KEY_STRIDE = 1 << 33


def scale_dir_name(factors: dict[str, int] | None = None) -> str:
    """Cache-dir name derived from the factor set, so a factor change never
    silently reuses a stale materialization."""
    factors = factors or DEFAULT_FACTORS
    return "x".join(f"{k[:2]}{v}" for k, v in sorted(factors.items()))


def _scale_table(
    spark: SparkSession, sf_dir: str, name: str, replicas: int, partitions: int = 32
) -> DataFrame:
    # Spread the source across the write parallelism BEFORE the replica
    # fan-out: a single-file sf table scans as ~3 input splits, and the
    # broadcast crossJoin preserves its parent's partitioning — so without
    # this, a 240 M-row expansion funnels through 3 threads (observed
    # round 11: the 4x curve cache spent >10 min on a 3-task stage that
    # takes ~1 min at 32-way).
    df = load_table(spark, sf_dir, name).repartition(partitions)
    wide = df.crossJoin(
        F.broadcast(spark.range(replicas).select(F.col("id").alias("rep")))
    )
    rep = F.col("rep")
    shift = rep * F.lit(KEY_STRIDE)
    if name == "orders":
        out = wide.select(
            (F.col("o_orderkey") + shift).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    elif name == "lineitem":
        out = wide.select(
            (F.col("l_orderkey") + shift).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
    elif name == "events":
        # widen the user key-space and jitter ts so sessions/windows stay
        # realistic instead of collapsing into 100-way exact duplicates
        out = wide.select(
            (F.col("event_id") + shift).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=(rep % 97))).alias("ts"),
            (F.col("user_id") + rep * F.lit(1_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    elif name == "documents":
        # Replica 0 is the pristine corpus; replicas >0 get a replica token
        # prefixed so content hashes differ. Without this, exact dedup sees
        # every doc duplicated `replicas`× — a pathological shape no real
        # corpus has (near-dup CLUSTER sizes stay what they were; corpus
        # grows in distinct docs, which is how 100 TB corpora actually grow).
        text = F.when(rep == 0, F.col("text")).otherwise(
            F.concat(F.lit("r"), rep.cast("string"), F.lit(" "), F.col("text"))
        )
        out = wide.select(
            (F.col("doc_id") + shift).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    elif name == "embeddings":
        # Replica 0 pristine; replicas >0 sign-flip each dimension by a
        # deterministic per-(replica, dim) pattern. A shared pattern
        # preserves all WITHIN-replica cosines (cos(s⊙a, s⊙b) = cos(a, b))
        # while making cross-replica vectors uncorrelated — so similarity
        # structure replicates instead of collapsing into `replicas`-sized
        # identical clusters that would make any near-dup op quadratic.
        emb = F.when(rep == 0, F.col("embedding")).otherwise(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(rep * F.lit(104729) + i), F.lit(2)) == 0, x
                ).otherwise(-x),
            )
        )
        out = wide.select(
            (F.col("vec_id") + shift).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        )
    else:  # pragma: no cover - caller passes fact tables only
        raise ValueError(f"not a scalable fact table: {name}")
    return out


def materialize_scale(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    factors: dict[str, int] | None = None,
    partitions: int = 32,
) -> dict[str, int]:
    """Write the amplified sf dir; returns row counts. Idempotent via marker.

    Layout matches a testdata dir (``<out>/<table>.parquet``) — scaled facts
    become parquet directories, untouched dimensions are copied as files.
    """
    factors = factors or DEFAULT_FACTORS
    out = pathlib.Path(out_dir)
    marker = out / "_SCALE_OK"
    if marker.exists():
        import json

        return json.loads(marker.read_text())
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    counts: dict[str, int] = {}
    for name in UNSCALED:
        src = os.path.join(sf_dir, f"{name}.parquet")
        shutil.copy(src, out / f"{name}.parquet")
    for name, replicas in factors.items():
        df = _scale_table(spark, sf_dir, name, replicas, partitions)
        # The pre-fan-out repartition already spread the source across
        # `partitions` splits; a second post-fan-out repartition would
        # shuffle the full expanded table (120 M+ rows) just to land on
        # the same file count.
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
        counts[name] = spark.read.parquet(str(out / f"{name}.parquet")).count()

    import json

    marker.write_text(json.dumps(counts))
    return counts
