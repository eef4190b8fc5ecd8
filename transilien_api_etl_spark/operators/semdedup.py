"""SemDeDup stage 2 at corpus scale — the within-cluster prune as a
grouped Arrow kernel (SURVEY.md §3 F10 scale path).

The registered `semdedup_survivors` plan keeps its JVM within-cluster
self-join at driver SFs (k=8 clusters of ≤ a few hundred rows — the
cross-engine oracle's bit-parity domain). Above the derived-k threshold
(plans/semdedup_q.py) clusters hold thousands of rows and the pair work is
Σ cluster_size² cosines: a per-pair HOF fold would evaluate dim interpreted
multiplies per pair, while one numpy gram matrix per cluster does the same
arithmetic as blocked BLAS. ``applyInPandas`` over ``groupBy(cluster)`` is
exactly the Spark shape for this — one shuffle keyed by cluster, then an
embarrassingly parallel kernel per group, no driver involvement, so at
100 TB the cost is the one exchange plus Σ size² FLOPs spread over the
cluster.

Semantics match the JVM join: drop a member iff SOME smaller-id member of
the same cluster has round(cosine, 6) ≥ τ (neighbours need not themselves
survive). Only the float summation order differs (pairwise-BLAS vs the
sequential fold), which is outside the oracle-parity domain by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Cap on gram-block entries (rows_block × cluster_size doubles): 2^21
# entries = 16 MiB per temporary, so even a badly skewed 100 k-row cluster
# blocks at ~20 rows a time instead of materializing a 10^10-entry matrix.
_BLOCK_ENTRIES = 1 << 21


def within_cluster_dup_ids(
    km: DataFrame,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cluster_col: str = "cluster",
) -> DataFrame:
    """ids having a smaller-id, same-cluster neighbour with cosine ≥ τ."""

    def prune(pdf):
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = len(pdf)
        if m <= 1:
            return pdf.iloc[0:0][[id_col]]
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            nrm = np.sqrt((x * x).sum(axis=1))
            dup = np.zeros(m, dtype=bool)
            step = max(1, _BLOCK_ENTRIES // m)
            cols = np.arange(m)
            for lo in range(1, m, step):
                hi = min(lo + step, m)
                # rows lo:hi against ALL columns < row index (sorted by id,
                # so "smaller id" == "earlier row")
                s = x[lo:hi] @ x[:hi].T
                s /= nrm[lo:hi, None]
                s /= nrm[None, :hi]
                s = np.round(s, 6)
                mask = cols[None, :hi] < np.arange(lo, hi)[:, None]
                # NaN (zero-norm vector) compares False — never a dup,
                # same as the JVM filter where NULL/NaN ≥ τ is not true.
                dup[lo:hi] = np.greater_equal(
                    s, tau, where=mask, out=np.zeros_like(s, dtype=bool)
                ).any(axis=1)
        return pdf.loc[dup, [id_col]]

    return km.select(id_col, vec_col, cluster_col).groupBy(cluster_col).applyInPandas(
        prune, schema=f"{id_col} long"
    )
