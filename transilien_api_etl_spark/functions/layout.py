"""Multi-dimensional data-layout expressions (S6 scan-pruning, the 2-D
generalization of ``write_range_clustered``).

``z_value`` interleaves the bits of two bounded non-negative ints into a
Morton (Z-order) key, entirely in JVM expressions (shift/and/or — fused by
whole-stage codegen). Range-partitioning + sorting by the Z key clusters
BOTH dimensions at once: every output file covers a small rectangle of
(a, b) space, so parquet footer min/max statistics prune files for
predicates on EITHER column — a 1-D sort would prune only its own column.

This is the layout trick behind Delta/Iceberg Z-ORDER BY, reduced to its
primitive: nothing about it needs a table format, just a deterministic
space-filling-curve key and a range-clustered write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two ints in [0, 2^bits): a→even, b→odd bits."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def write_z_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order layout: range-partition + sort by the Morton key of
    (col_a, col_b); both columns get footer-statistics file pruning."""
    z = z_value(F.col(col_a), F.col(col_b), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
