"""Pandas-UDF surface (SURVEY.md §3.10 X1-X3).

These exist to prove the Arrow-vectorized Python path end-to-end — each has
a built-in-function twin whose oracle it must match exactly. Policy: UDFs
are the slow path; production plans use the built-in twin unless the logic
is genuinely inexpressible (see operators/multimodal.py for a real case).
"""

from __future__ import annotations

import pandas as pd
import numpy as np

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.LongType())
def token_count_pudf(text: pd.Series) -> pd.Series:
    """X1 scalar series→series: whitespace token count (Arrow-batched).
    NULL text yields NULL (nullable Int64) like the size(split) built-in
    twin — one blank field in a real feed must not kill the whole job
    (``.astype('int64')`` on the NaN a None produces raises)."""
    return text.str.split(" ").str.len().astype("Int64")


@F.pandas_udf(T.DoubleType())
def weighted_avg_pudf(value: pd.Series, weight: pd.Series) -> float:
    """X3 grouped-agg UDAF: Σwx/Σw. Plain float64 sums (sequential), so the
    DuckDB sum(w*x)/sum(w) twin agrees to rounding precision. Rows where
    either side is NULL are skipped — SQL aggregate semantics, matching
    the oracle twin (np.dot would otherwise poison the group to NaN);
    an all-NULL or zero-weight group returns NULL, not inf/NaN."""
    w = weight.to_numpy(dtype="float64")
    x = value.to_numpy(dtype="float64")
    keep = ~(np.isnan(w) | np.isnan(x))
    w, x = w[keep], x[keep]
    tw = w.sum()
    if w.size == 0 or tw == 0.0:
        return None
    return float(np.dot(w, x) / tw)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes (deterministic, stdlib).

    Round 3: the per-token hash is the FIRST 8 BYTES of md5, big-endian
    (was blake2b-8) — md5 is the one digest DuckDB also ships, so the
    oracle can replay the exact bit votes and the registered query is
    hash-checked instead of rows-only."""
    import hashlib

    acc = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    # to signed 64-bit for LongType
    return v - (1 << 64) if v >= (1 << 63) else v


@F.pandas_udf(T.LongType())
def simhash_pudf(text: pd.Series) -> pd.Series:
    """X1: SimHash fingerprint — bit-vote aggregation is awkward as pure SQL
    (64 conditional sums + sign recombination), a genuine pandas-UDF case."""
    return text.map(lambda s: simhash64(s.split(" "))).astype("int64")
