"""Connected components over a pair list — dedup clustering (SURVEY §3 F10,
the step after candidate generation: similar-pairs → clusters → one
canonical survivor per cluster).

Iterative min-label propagation on DataFrames: each node takes the min of
its own label and its neighbors' labels until fixpoint. Lineage is
truncated per iteration (localCheckpoint) so the plan doesn't grow
exponentially; convergence needs O(graph diameter) rounds — near-dup
clusters are shallow, so this is a handful of small shuffles.

At 100 TB use the large-star/small-star variant (halves diameter per
round, same DataFrame primitives); propagation here is the readable core
the optimization shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """Label every node with the min node id of its component.

    ``edges`` is an undirected pair list (each pair once is enough).
    Returns (node, cluster) — cluster = min member id.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("s").alias("node")).distinct().withColumn("lbl", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("s", "node")
        )
        new_labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
        ).localCheckpoint(eager=True)
        changed = (
            labels.withColumnRenamed("lbl", "old")
            .join(new_labels, "node")
            .filter(F.col("old") != F.col("lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.withColumnRenamed("lbl", "cluster")
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
