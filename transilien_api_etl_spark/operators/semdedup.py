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
cluster. The kernel emits the SURVIVOR rows directly — it already holds
the whole cluster, so a dup-ids + anti-join shape would re-evaluate the
dominant Θ(n·k) assignment lineage a second time on the other side of the
join (measured: the round-7 review caught exactly that, ~2× the query).

Semantics match the JVM join, including its edges: drop a member iff SOME
smaller-id member of the same cluster has round(cosine, 6) ≥ τ, where
neighbours need not themselves survive, rounding is half-UP (the JVM /
DuckDB tie behavior, not numpy's half-even), and a NaN cosine (a
NaN-poisoned embedding) COUNTS as ≥ τ — both Spark and DuckDB order NaN
above every value, so the JVM filter drops such rows and this kernel
must too (tests/test_scale_arrow_paths.py). One deliberate divergence:
a ZERO-NORM vector is 0/0 — the JVM form raises DIVIDE_BY_ZERO under
ANSI where this kernel produces NaN and therefore drops the row, per
the repo's degrade-never-job-kill convention for out-of-contract
inputs. Only the float summation order otherwise differs
(pairwise-BLAS vs the sequential fold), which is outside the
oracle-parity domain by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from transilien_api_etl_spark.functions.vectors import round_half_up

# Cap on gram-block entries (rows_block × cluster_size doubles): 2^21
# entries = 16 MiB per temporary, so even a badly skewed 100 k-row cluster
# blocks at ~20 rows a time instead of materializing a 10^10-entry matrix.
_BLOCK_ENTRIES = 1 << 21


def within_cluster_survivors(
    km: DataFrame,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cluster_col: str = "cluster",
) -> DataFrame:
    """(id, cluster) rows having NO smaller-id, same-cluster neighbour
    with cosine ≥ τ (NaN counting as ≥ τ, as both engines compare it).

    Raises ValueError unless ``tau > 0`` AND ``tau`` is exactly its own
    6-dp half-up rounding (ADVICE r8: the raise is part of the public
    contract, not an internal detail): the single-comparison threshold
    below folds the round-to-6dp step into the cut, which is only an
    identity for taus representable at 6 decimal places. A caller with a
    computed tau must round it to 6 dp first — silently rounding here
    would diverge from the JVM round-then-compare semantics it mirrors.
    The equality check inherits round_half_up's documented 1-ULP midpoint
    caveat; taus given as ≤6-dp literals (every in-repo caller) are exact.
    """

    if not tau > 0:
        raise ValueError(
            "within_cluster_survivors requires tau > 0: the single-pass "
            "threshold form below folds the 6-dp half-up rounding into "
            "the cut and assumes negative cosines can never qualify"
        )
    import numpy as np

    if float(round_half_up(np.array(tau), 6)) != float(tau):
        # The one-comparison cut (round_half_up(s,6) >= tau ⇔
        # s >= tau - 0.5e-6) is only an identity when tau itself is
        # representable at 6 decimal places; a finer tau would silently
        # diverge from the JVM round-then-compare semantics. ADVICE r7.
        raise ValueError(
            f"tau={tau!r} is not representable at 6 decimal places; the "
            "single-comparison threshold form requires tau == "
            "round_half_up(tau, 6)"
        )
    # round_half_up(s, 6) >= tau  ⇔  s >= tau − 0.5·10⁻⁶ (for tau > 0
    # given at ≤6 dp), so ONE comparison replaces round+compare — the
    # gram matrices are ~10⁹ entries per cluster batch and every extra
    # full-matrix pass is ~seconds of memory traffic (measured: the
    # round-then-compare form cost +50% on the whole query). Written as
    # ~(s < cut) so NaN (comparing False either way) lands on the DUP
    # side, matching Spark/DuckDB's NaN-above-everything ordering.
    cut = float(tau) - 0.5e-6

    def prune(pdf):
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = len(pdf)
        if m <= 1:
            return pdf[[id_col, cluster_col]]
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
                mask = cols[None, :hi] < np.arange(lo, hi)[:, None]
                dup[lo:hi] = (~(s < cut) & mask).any(axis=1)
        return pdf.loc[~dup, [id_col, cluster_col]]

    return (
        km.select(id_col, vec_col, cluster_col)
        .groupBy(cluster_col)
        .applyInPandas(prune, schema=f"{id_col} long, {cluster_col} int")
    )
