"""Query plans. Importing this package registers every named query.

Registration order is what the driver's correctness harness walks, and its
CORRECTNESS artifact records only the FIRST 50 registered queries per round
(observed rounds 1-2: each recorded exactly 50 rows; rounds 1 and 2 checked
disjoint 50s — union 100 of 188). The order is therefore SELF-ROTATING
(`_reorder_registry` below): queries with no green row in any
CORRECTNESS_r*.json sort before queries that have one, so every round's
50-entry cap lands on 50 fresh queries with no further edits. Ties break
by the explicit priority lists (``_DRIVER_WINDOW`` — the round-3 window:
49 never-checked queries plus ``docs_dup_clusters``, driver-ERR in both
prior rounds until its array-column canonicalization fix — then
``_NEXT_WINDOW``), then original import order.
``tests/test_registration_order.py`` gates both the rotation invariant and
the concrete round-3 window — change the lists, not import order.
"""

from transilien_api_etl_spark.plans import (  # noqa: F401  (import = registration)
    text_q,
    vectors_q,
    semdedup_q,
    warehouse_q,
    graph_q,
    sql_surface_q,
    sketches_q,
    udfs_q,
    windows,
    analytics_q,
    quantize_q,
    text_more_q,
    pq_q,
    surface_more_q,
    pipeline_q,
    tpch_more,
    domain_q,
    events_q,
    streaming_q,
    relational,
    relational_ext,
    functions_q,
    twin_checks_q,
)
from transilien_api_etl_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_queries,
    oracle_sql,
    queries,
)

# Round-3 driver window: position 1-50 of registration order. One previously
# driver-RED query (docs_dup_clusters, fixed this round) + 49 queries that
# have never earned a driver correctness row (absent from CORRECTNESS_r01
# and CORRECTNESS_r02).
_DRIVER_WINDOW: tuple[str, ...] = (
    "docs_dup_clusters",
    "window_rolling_avg",
    "window_lag_headway",
    "window_running_sum",
    "window_ntile_pct",
    "window_first_last_nth",
    "window_ewma_10",
    "window_share_of_total",
    "agg_linreg_user_trend",
    "agg_moment_stats",
    "events_cohort_retention",
    "events_twap",
    "attribution_linear_touch",
    "agg_ab_welch_ttest",
    "window_rolling_median",
    "agg_equidepth_histogram",
    "range_join_banded_global",
    "events_anomaly_zscore",
    "orders_pareto_abc",
    "events_activity_streaks",
    "orders_mom_growth",
    "events_rfm_segments",
    "orders_gini_revenue",
    "events_autocorr_lag1",
    "events_changepoint_binary",
    "orders_basket_lift",
    "events_kaplan_meier",
    "embeddings_quantize_int8",
    "knn_sq8_top10",
    "knn_ivf_sq8_top10",
    "embeddings_pq_codes",
    "knn_pq_adc_top10",
    "docs_pmi_collocations",
    "events_hierarchical_rollup",
    "docs_token_entropy",
    "agg_approx_top_k_twin",
    "sql_pipe_revenue_by_status",
    "udtf_polymorphic_charstats",
    "pretrain_corpus_report",
    "pretrain_curated_docs",
    "pretrain_sample_mix",
    "pretrain_pack_sequences",
    "docs_chunk_windows",
    "decontaminate_docs",
    "docs_bigram_counts",
    "sample_k_per_source",
    "split_train_val_test",
    "docs_bigram_lm_score",
    "transilien_next_departures",
    "fn_tz_paris_offsets",
)

# Queue for the NEXT driver window (round 4+): every other query that has
# no CORRECTNESS_r01/r02 row, in stable order. Everything already checked
# green in a prior round sorts after these.
_NEXT_WINDOW: tuple[str, ...] = (
    "q8_market_share",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_part_value",
    "q16_supplier_part_count",
    "q20_excess_share_suppliers",
    "events_resample_1h_ffill",
    "agg_histogram_value",
    "events_concurrency_curve",
    "events_mad_outliers",
    "events_session_funnel",
    "events_interpolate_linear",
    "streaming_upsert_foreachbatch",
    "streaming_session_window",
    "streaming_sliding_10m_5m",
    "streaming_stream_stream_join",
    "streaming_incremental_agg",
    "streaming_stream_stream_left_join",
    "streaming_chained_windows",
    "streaming_incremental_dedup",
    "streaming_pit_rate_join",
    "dq_profile_orders",
    "join_full_outer_daily_volume",
    "join_null_safe_buckets",
    "agg_percentile_disc",
    "fn_map_higher_order",
    "agg_salted_twin",
    "agg_boolean_family",
    "fn_listagg_ordered",
    "fn_try_arithmetic",
    "fn_explode_outer_terms",
    "fn_array_setops",
    # round-3 additions: hash-checked twins of the rows-only sketch/LSH
    # queries (plans/twin_checks_q.py) — never driver-checked, queued next
    "sketch_cms_error_bounds",
    "docs_minhash_recall",
    "udf_simhash_separation",
    "docs_fingerprint_integrity",
    "lsh_ann_recall",
    # gained a DuckDB oracle in round 3 (pure-ASCII corpus makes the stub
    # features SQL-exact) — its r2 record was no_oracle, so re-window it
    "multimodal_decode_features",
)


def _green_rounds(repo: str | None = None) -> dict[str, int]:
    """Map each green-checked query to the ROUND of its most recent green.

    A row counts as green when its hash matched, or when the driver
    recorded ``no_oracle`` for a query that (still) has no oracle —
    re-running those earns nothing. Errors, mismatches, and ``no_oracle``
    rows for queries that have SINCE gained an oracle count as unchecked,
    so they rotate back into the window. The MOST RECENT round's record
    wins per query (ADVICE r3): a query that regresses after once
    passing is un-greened and rotates back in, instead of sorting
    permanently into the never-rechecked back half. Reads every
    CORRECTNESS_r*.json at the repo root in PARSED round order (not
    lexicographic, which would slot r100 between r10 and r11);
    malformed/absent artifacts are simply skipped."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    if repo is None:
        repo = _os.path.dirname(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        )

    def _round_num(path: str) -> int:
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", _os.path.basename(path))
        return int(m.group(1)) if m else -1

    last: dict[str, int | None] = {}
    for path in sorted(
        _glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json")), key=_round_num
    ):
        rnd = _round_num(path)
        try:
            with open(path, encoding="utf-8") as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match") is True:
                last[name] = rnd
            elif rec.get("err") == "no_oracle" and not (
                name in REGISTRY and REGISTRY[name].oracle
            ):
                last[name] = rnd
            else:
                last[name] = None
    return {name: rnd for name, rnd in last.items() if rnd is not None}


def _green_checked(repo: str | None = None) -> set[str]:
    """Queries that already hold a usable driver correctness row."""
    return set(_green_rounds(repo))


def _reorder_registry() -> None:
    """Self-rotating driver window: every query that has never earned a
    green driver row sorts BEFORE every query that has, so each round's
    50-entry correctness cap lands on 50 fresh queries with no edits.
    Within each half, the explicit priority lists above (then original
    registration order) break ties deterministically."""
    priority = [*_DRIVER_WINDOW, *_NEXT_WINDOW]
    missing = [n for n in priority if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"driver-window names not registered: {missing}")
    base = [*priority, *[n for n in REGISTRY if n not in set(priority)]]
    greens = _green_rounds()
    base_idx = {n: i for i, n in enumerate(base)}
    # Green half re-verifies STALEST-FIRST: once every query has been
    # checked at least once, each round's 50-cap lands on the 50 whose
    # last green is oldest (VERDICT r4 task 7), so driver coverage keeps
    # cycling instead of re-checking the same recent window forever.
    ordered_names = [n for n in base if n not in greens] + sorted(
        (n for n in base if n in greens), key=lambda n: (greens[n], base_idx[n])
    )
    ordered = {n: REGISTRY[n] for n in ordered_names}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
