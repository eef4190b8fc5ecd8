"""Deduplication family (SURVEY.md §3 F10; BASELINE.json mandate).

- exact_dedup: deterministic keep-first via row_number (dropDuplicates is
  nondeterministic about WHICH duplicate survives — unacceptable when the
  output is hash-compared or replayed).
- canonical_row_hash: sha2 over a canonical string projection. Hash only
  int/string columns (float→string formatting differs across engines).
- minhash_signature_pairs: pure-DataFrame MinHash + LSH banding. Everything
  stays JVM-side (xxhash64 + hash-agg); no Python boundary. At 100 TB the
  band-bucket join replaces the quadratic pairwise join: candidates per
  band-bucket only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, subset: list[str], order_by: list[Column]) -> DataFrame:
    """Keep exactly one row per ``subset`` key: the first under ``order_by``."""
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def canonical_row_hash(cols: list[str], sep: str = "|") -> Column:
    """sha256 hex of a canonical '|'-joined projection (engine-portable)."""
    return F.sha2(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]), 256)


def minhash_signature_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Signature: for seed s, min over tokens of xxhash64(token, s). Banding:
    hash each run of ``band_size`` signature slots; docs sharing any band
    bucket become a candidate pair. Returns (id_a, id_b, n_shared_bands).
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens_col)).alias("tok"))
    sig_aggs = [
        F.min(F.xxhash64(F.col("tok"), F.lit(s))).alias(f"h{s}") for s in range(num_hashes)
    ]
    sigs = tok.groupBy("id").agg(*sig_aggs)
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + i}") for i in range(band_size)]
        bands.append(
            sigs.select(
                "id", F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
