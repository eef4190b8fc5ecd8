"""IVF inverted lists as parquet partitions (SURVEY §3 F8 scale claim):
the IVF queries' docstrings state that at 100 TB the inverted lists are
parquet partitions keyed by cell, so a probe reads only (probed cells /
total cells) of the bytes. This test materializes that layout — corpus
written ``partitionBy(cell)``, cells from the same deterministic k-means
assignment the registered queries use — and asserts the probe plan prunes
at PLANNING time (static PartitionFilters, no dynamic filter needed) and
returns the exact same top-k as the unpartitioned scan."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from transilien_api_etl_spark.functions.vectors import cosine_scores_arrow
from transilien_api_etl_spark.operators.kmeans import kmeans_assign

from .conftest import SF_SMOKE


def test_ivf_cell_partitions_prune_statically(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assigned = kmeans_assign(
        emb, id_col="vec_id", vec_col="embedding", k=4, iterations=1
    ).select("vec_id", F.col("cluster").alias("cell"))
    cells = emb.join(assigned, "vec_id").select("vec_id", "embedding", "cell")

    d = tempfile.mkdtemp(prefix="ivf-")
    lists_path = os.path.join(d, "ivf_lists")
    cells.write.partitionBy("cell").parquet(lists_path)
    lists = spark.read.parquet(lists_path)

    probed = [0, 1]  # the coarse-quantizer's 2 nearest cells
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    qn = 0.0
    for x in qvec:
        qn += x * x
    qn = qn**0.5

    fine = lists.filter(F.col("cell").isin(probed)).filter(F.col("vec_id") != 0)
    top = (
        cosine_scores_arrow(fine, qvec, qn)
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )

    plan = top._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # static pruning: the cell predicate reaches PartitionFilters on the
    # scan — planning-time, no runtime subquery required
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0], plan

    # and the probed scan is value-identical to filtering the flat corpus
    flat = (
        cosine_scores_arrow(
            cells.filter(F.col("cell").isin(probed)).filter(
                F.col("vec_id") != 0
            ),
            qvec,
            qn,
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )
    assert [tuple(r) for r in top.collect()] == [tuple(r) for r in flat.collect()]
