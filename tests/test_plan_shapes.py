"""Physical-plan audits (SURVEY §5, task mandate: '.explain the plan and
iterate until it's the plan you'd want').

These lock in the scale posture: fact-table queries must never plan a
CartesianProduct or a BroadcastNestedLoopJoin (the two shapes that die at
100 TB), dimension joins must broadcast, and filters/projections must reach
the parquet scan.
"""

from __future__ import annotations

import pytest

from transilien_api_etl_spark import plans

SF = "/root/testdata/sf0.001"

# Queries whose plan may legitimately contain a nested-loop/cartesian shape:
# region×region is 5×5; the kNN/IVF probes cross-join a broadcast 1-row or
# 2-row side (bounded by construction); pairwise exact dedup is the
# documented quadratic oracle for the LSH path.
NLJ_ALLOWED = {
    "cross_join_region_pairs",
    "knn_cosine_top10",
    "knn_ivf_top10",
    "dedup_embedding_cosine",
    "docs_shingle_jaccard",
    # value > scalar-total comparison: BNLJ against a broadcast 1-row
    # aggregate — bounded by construction, the right plan at any scale
    "q11_important_part_value",
    # merged-sketch row × direct-sketch row: both sides are single-row
    # aggregates, the cross join is 1×1 by construction
    "sketch_hll_mergeable_rollup",
    # corpus-total normalizer: BNLJ against a broadcast 1-row aggregate
    # (the q11 shape) — bounded by construction
    "docs_pmi_collocations",
    # IVF probe: centroid×1-row-query cross — 8×1, bounded by construction
    "knn_ivf_sq8_top10",
    # global-max anchor: BNLJ against a broadcast 1-row aggregate (q11 shape)
    "events_rfm_segments",
    # n-orders normalizer: broadcast 1-row aggregate cross (q11 shape)
    "orders_basket_lift",
    # corpus-end anchor: broadcast 1-row aggregate cross (q11 shape)
    "events_kaplan_meier",
}

FACT_QUERIES = [
    "range_join_clicks_before_purchase",  # equi key → hash join, range post-filtered
    "dedup_exact_rows",
    "udtf_explode_shingles",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "topk_orders_per_customer",
    "events_sessionize",
    "events_tumbling_1h",
    "asof_join_purchase_click",
    "dedup_exact_docs",
    "docs_token_stats",
    "window_rolling_avg",
    "join_left_order_counts",
    "join_semi_big_spenders",
    "join_anti_no_orders",
    "q4_order_priority_exists",
    "q17_small_quantity_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q8_market_share",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "pretrain_corpus_report",
    "pretrain_curated_docs",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q16_supplier_part_count",
    "q20_excess_share_suppliers",
    "pretrain_sample_mix",
    "pretrain_pack_sequences",
    "docs_chunk_windows",
    "decontaminate_docs",
    "docs_bigram_counts",
    "events_resample_1h_ffill",
    "events_concurrency_curve",
    "events_mad_outliers",
    "events_session_funnel",
    "window_ewma_10",
    "dq_profile_orders",
    "sample_k_per_source",
    # round-2 session additions
    "docs_pii_scrub",
    "docs_repetition_metrics",
    "docs_bigram_lm_score",
    "split_train_val_test",
    "graph_pagerank_trade",
    "sql_lateral_top2_orders",
    "fn_variant_props",
    "fn_listagg_ordered",
    "fn_try_arithmetic",
    "streaming_chained_windows",
    # round-2 continuation additions
    "docs_segment_dedup",
    "events_interpolate_linear",
    "agg_moment_stats",
    "join_full_outer_daily_volume",
    "join_null_safe_buckets",
    "fn_explode_outer_terms",
    "udf_arrow_grouped_range",
    "embeddings_kmeans",
    "semdedup_survivors",
    "docs_tokenize_ids",
    "agg_moment_stats",
    "agg_percentile_disc",
    "fn_map_higher_order",
    "fn_array_setops",
    "fn_tz_paris_offsets",
    "agg_salted_twin",
    "agg_boolean_family",
    "streaming_incremental_dedup",
    "transilien_next_departures",
    # analytics composites
    "events_cohort_retention",
    "events_twap",
    "attribution_linear_touch",
    "agg_ab_welch_ttest",
    "window_rolling_median",
    "agg_equidepth_histogram",
    "events_hierarchical_rollup",
    # keyless interval join must NOT be the BNLJ it would naively plan
    "range_join_banded_global",
    # quantized ANN: literal-model kernels must stay join-free
    "knn_sq8_top10",
    "embeddings_quantize_int8",
    "embeddings_pq_codes",
    "knn_pq_adc_top10",
    # Spark 4 surface
    "agg_approx_top_k_twin",
    "sql_pipe_revenue_by_status",
    "events_anomaly_zscore",
    "docs_token_entropy",
    "orders_pareto_abc",
    "events_activity_streaks",
    "orders_mom_growth",
    "orders_gini_revenue",
    "events_autocorr_lag1",
    "events_changepoint_binary",
]


def test_kmeans_assignment_is_join_free(spark):
    """The k-means argmin rides the scan as a literal-centroid fold: the
    final assignment plan must contain no Join at all — the only wide node
    allowed is the presentation sort."""
    plan = _physical_plan(spark, "embeddings_kmeans")
    assert "Join" not in plan, f"kmeans assignment must be map-only:\n{plan}"


def test_sample_mix_and_chunking_are_map_only(spark):
    """Sampling and chunking must ride the scan: no exchange at all (the
    final presentation orderBy is rangepartitioning, which AQE drops on
    write; hashpartitioning exchanges would mean an accidental shuffle)."""
    for name in ("pretrain_sample_mix", "docs_chunk_windows"):
        plan = _physical_plan(spark, name)
        assert "Exchange hashpartitioning" not in plan, f"{name}:\n{plan}"


def test_pretrain_pipeline_single_wide_shuffle(spark):
    """The curation pipeline's only wide shuffle is the digest group-by:
    metrics + quality gate must fuse into the scan stage, not exchange."""
    plan = _physical_plan(spark, "pretrain_corpus_report")
    # one exchange for the sha digest groupBy, one for the tiny lang
    # groupBy, plus the final 1-partition sort — no join exchanges.
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, f"pipeline should be join-free:\n{plan}"


def test_q21_double_exists_decorrelates(spark):
    """EXISTS + NOT EXISTS over the same derived relation must both
    decorrelate (semi + anti join), never re-scan per row."""
    plan = _physical_plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan, f"q21 EXISTS did not become a semi join:\n{plan}"
    assert "LeftAnti" in plan, f"q21 NOT EXISTS did not become an anti join:\n{plan}"


def test_exists_subquery_decorrelates_to_semi_join(spark):
    plan = _physical_plan(spark, "q4_order_priority_exists")
    assert "LeftSemi" in plan, f"EXISTS did not decorrelate to a semi join:\n{plan}"


def _physical_plan(spark, name: str) -> str:
    import contextlib
    import io

    df = plans.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", FACT_QUERIES)
def test_no_cartesian_or_bnlj_on_fact_paths(spark, name):
    plan = _physical_plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a BroadcastNestedLoopJoin:\n{plan}"
    )


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier"])
def test_dim_joins_broadcast(spark, name):
    plan = _physical_plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast dim join:\n{plan}"


def test_q1_filter_pushed_to_scan(spark):
    plan = _physical_plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_q1_column_pruned_scan(spark):
    plan = _physical_plan(spark, "q1_pricing_summary")
    # 7 needed columns only — the 11-column lineitem scan must be pruned
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema, read_schema
    assert "l_quantity" in read_schema and "l_shipdate" in read_schema, read_schema


def test_sort_limit_is_take_ordered(spark):
    plan = _physical_plan(spark, "sort_global_top100")
    assert "TakeOrderedAndProject" in plan, plan


def test_topk_per_group_keeps_window_group_limit(spark):
    """row_number-over-window + rank filter must keep Spark's
    WindowGroupLimit pushdown, BOTH sides of the shuffle: the Partial pass
    prunes each map partition to k rows per group BEFORE the exchange —
    at 100 TB that is the difference between shuffling k·|groups| rows
    and shuffling the whole fact table. A reshaped query (e.g. rank in a
    subquery the optimizer can't see through) silently loses it."""
    plan = _physical_plan(spark, "topk_orders_per_customer")
    # formatted explain puts the node name and its mode on separate lines:
    # two WindowGroupLimit nodes, one Partial (map-side, pre-exchange) and
    # one Final argument line
    assert plan.count("WindowGroupLimit") >= 2, f"group-limit pushdown lost:\n{plan}"
    assert "row_number(), 3, Partial" in plan, f"no map-side group limit:\n{plan}"
    assert "row_number(), 3, Final" in plan, f"no final group limit:\n{plan}"


def test_whole_stage_codegen_on_q1(spark):
    import contextlib
    import io

    df = plans.queries()["q1_pricing_summary"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    plan = buf.getvalue()
    # the scan+filter+partial-agg pipeline must be one fused codegen subtree
    assert "WholeStageCodegen subtree" in plan, plan


def test_lateral_decorrelates_to_window_topk(spark):
    """Correlated LATERAL + LIMIT must become the window/top-k shape, not a
    per-outer-row rescan (the decorrelation SURVEY §5 promises)."""
    plan = _physical_plan(spark, "sql_lateral_top2_orders")
    assert "Window" in plan, f"lateral did not decorrelate to a window:\n{plan}"
    assert "CartesianProduct" not in plan


def test_variant_query_is_single_scan(spark):
    """VARIANT parse + typed extraction must fuse into one scan + one agg —
    a second scan would double the 100 TB read."""
    plan = _physical_plan(spark, "fn_variant_props")
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2
