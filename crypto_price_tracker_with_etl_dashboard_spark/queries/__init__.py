"""Query registry: names -> (PySpark callable, oracle SQL).

Each submodule registers its queries with ``register``; the driver
contract (__spark_entry__.py) re-exports the two dicts.  A query
registered with ``sql=None`` gets the driver's weaker rows-only check
(used only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    if name in SPARK_QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    SPARK_QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


from crypto_price_tracker_with_etl_dashboard_spark.queries import reference  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import relational  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import tpch  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import timeseries  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import olap  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import sampling  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import text  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import vector  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import multimodal  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import joins  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import finance  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import graph  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registration ORDER is part of the driver contract: the driver's
# correctness gate verifies the FIRST 50 registered queries against the
# DuckDB oracle.  Module import order interleaves registrations, so we
# pin the window explicitly.
#
# WINDOW ROTATION POLICY (round 3 onward): the window is
#   FIXED_CORE (certified every round) + NEW_THIS_ROUND (debuts — new
#   work must earn driver evidence in its own round, r2 rule) + the
#   next ROTATION_POOL slots from the cursor (_ROTATION_STARTS records
#   actual consumption; a round with d debuts consumes
#   50 - |FIXED_CORE| - d slots).  Everything stays registered and runs
#   in bench.py and tools/check_oracle.py every round.
#
# The per-round consumption history, the batch ledger (which round
# built each query batch, what each certifies), the uncertified-queue
# burn-down, AND the per-batch pool annotations all live in
# COVERAGE.md ("Rotation & certification ledger").  This module keeps
# only names, order, and cursor arithmetic.
#
# r8: the twelve r7 debuts joined the pool at the r8 cursor (index 46,
# before doc_token_bpe — consumed region, so they re-certify after a
# full loop).  Debuts rise 12 -> 20 (r7 verdict ask #2, funded BOTH
# ways it named: rotation cut 16 -> 12 now that the stale block is
# cleared, AND FIXED_CORE slimmed 22 -> 18 — the dedup/text/simsearch
# families keep 1-2 always-on representatives each, the parity core
# stays whole; the four slimmed queries re-enter the pool at the r9
# cursor so their evidence stays continuous).  The 20: the seven
# family heads the r7 shortlist named, the seven r7 builds (batches
# 56-58), two queue heads (events_triangles, doc_fuzzy_join), and the
# four r8-built batch-59 queries (the r2 rule: new work earns driver
# evidence in its own round).  Rotation = pool[58:70] = doc_token_bpe
# .. event_value_quantiles, the oldest (r5) evidence left — the slice
# committed in r7, untouched by the r8 insertions (all at index >= 70
# or the tail).
#
# r9: the twenty r8 debuts joined the pool at index 70 (the
# pre-insert cursor), pushing the recorded start to 90 (same
# arithmetic as r8's 46 + 12 = 58).  Debuts = the committed 20-name
# shortlist + emb_kmeans_gemm (r8 verdict ask #2); rotation slims
# 12 -> 11 to fund the extra debut (see NEW_THIS_ROUND note) and
# covers pool[90:101] = the four ex-core r8 slims first, then the
# oldest r5 block (event_value_quantiles_approx, q1, q3, q12,
# display_snapshot, media_audio_decode) and doc_simhash (r6).
#
# r10: the 21 r9 debuts joined the pool at index 101 (the pre-insert
# cursor), pushing the recorded start to 122 (= 101 + 21).  Debuts =
# the committed 20-name COVERAGE.md shortlist; rotation returns to 12
# slots and covers pool[122:134] = doc_langid (the r9-deferred name)
# first, then doc_pack_chunks .. events_interarrival.
#
# r11: the 20 r10 debuts joined the pool at index 134 (the pre-insert
# cursor), pushing the recorded start to 154 (= 134 + 20).  Debuts =
# the committed 20-name COVERAGE.md shortlist (batch 64 first, r2
# rule); rotation keeps 12 slots and covers pool[154:166] =
# tpch_integrity .. events_incremental_agg — the oldest remaining
# evidence (r6-r7 builds).
#
# r12: the 20 r11 debuts joined the pool at index 166 (the pre-insert
# cursor), pushing the recorded start to 186 (= 166 + 20).  Debuts
# rise 20 -> 22 and rotation slims 12 -> 10 (the r11 verdict's
# load-bearing drain-rate fix: -20/round certifies the full registry
# by r20; the r7 precedent, funded the same way) = the committed
# 20-name COVERAGE.md shortlist (batch 65 first, r2 rule) plus the
# two costliest remaining uncertified queries
# (orders_incremental_join, prices_var_historical — cost-first per
# the standing ask-#5 principle).  Rotation covers pool[186:196] =
# events_ab_lift .. events_type_hour_assoc.
# ---------------------------------------------------------------------------

DRIVER_WINDOW = 50
ROTATION_ROUND = 12  # bump each round; indexes _ROTATION_STARTS
_ROTATION_STARTS = {
    3: 0, 4: 18, 5: 38, 6: 6, 7: 30, 8: 58, 9: 90, 10: 122, 11: 154,
    12: 186,
}

FIXED_CORE: list[str] = [
    # reference parity core (7)
    "latest_snapshot", "history_slice", "topk_other", "market_share",
    "distinct_symbols", "ingest_normalize", "prices_ohlc_5min",
    # deduplication family (4)
    "doc_exact_dedup", "doc_minhash_lsh",
    "doc_dup_clusters", "doc_decontaminate",
    # text-analysis family (1)
    "doc_quality",
    # sampling / packing family (2)
    "doc_stratified_sample", "events_per_user_cap",
    # similarity-search family (2)
    "emb_cosine_topk", "emb_ann_recall",
    # multimodal family (2)
    "media_decode", "media_frame_sample",
]

# r12 debuts (22): the committed COVERAGE.md r12 shortlist — the two
# r11-built batch-65 queries first (the r2 new-work rule: the k-truss
# peel + IDF-weighted Jaccard), then the 18 remaining shortlist names
# (family heads across still-uncertified families), plus the two
# costliest remaining uncertified queries (orders_incremental_join,
# prices_var_historical — cost-first per the standing ask-#5
# principle), funded by rotation 12 -> 10 (the r11 verdict's
# load-bearing drain-rate fix).
NEW_THIS_ROUND: list[str] = [
    "events_ktruss", "doc_idf_weighted_jaccard",
    "prices_beta", "emb_matryoshka_recall", "prices_pair_spread",
    "prices_weekday_effect", "prices_backtest_naive", "doc_chi2_terms",
    "prices_sharpe", "events_conversion_latency", "emb_ivf_list_balance",
    "orders_customer_migration", "emb_binary_topk",
    "orders_backlog_series", "orders_aging_report", "events_winsorize",
    "prices_volume_profile", "media_image_histogram",
    "emb_centroid_margin", "emb_filtered_topk",
    "orders_incremental_join", "prices_var_historical",
]

# Names only — per-batch annotations live in COVERAGE.md's ledger.
# r11 edits: the 20 r10 debuts joined at index 134 (the r11 pre-insert
# cursor — consumed region, so they re-certify after a full loop);
# the 20 r11 debuts left the pool for NEW_THIS_ROUND and rejoin at
# the r12 cursor.
ROTATION_POOL: list[str] = [
    "q11_important_stock", "emb_ann_lsh", "emb_pq_quantize", "emb_pq_adc_topk",
    "doc_bm25_topk", "events_retention_cohorts", "q2_min_cost_supplier",
    "q4_order_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q13_order_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_diversity", "q17_small_quantity",
    "q18_large_volume", "q19_disjunctive_revenue", "q20_heavy_shippers",
    "q21_last_shipper", "q22_idle_balance", "top_orders_per_customer",
    "segment_order_stats", "emb_ivfadc_topk", "emb_gemm_audit",
    "events_salted_join", "orders_bucketed_join", "events_tumbling_5min",
    "prices_change_points", "events_sessionize", "events_asof_join",
    "events_range_join", "events_moving_stats", "events_daily_pivot",
    "events_unpivot", "prices_validity_intervals", "orders_rollup",
    "media_image_decode", "doc_pii_scrub", "doc_repetition",
    "emb_scalar_quantize", "doc_mixture_sample", "emb_kmeans",
    "prices_vwap_hourly", "prices_rsi", "prices_max_drawdown", "events_funnel",
    "emb_semdedup", "emb_knn_classify", "events_value_outliers",
    "events_profile", "prices_ema_macd", "doc_simhash_neardup",
    "trade_pagerank", "events_heavy_hitters", "doc_token_bpe",
    "doc_fingerprint", "doc_winnow", "doc_hash_split", "events_cube",
    "returned_orders_semi", "churned_customers_anti", "user_cohort_setops",
    "events_json_extract", "daily_distinct_users",
    "daily_approx_distinct_users", "event_value_quantiles", "events_top_paths",
    "events_markov", "doc_bigram_topk", "events_grouping_sets",
    "events_histogram", "emb_dim_stats", "prices_trend", "doc_keep_best_dedup",
    "doc_ngram_lm_hit_rate", "events_hll_rolling_wau", "media_frame_dups",
    "events_abandonment", "doc_dup_transitivity", "lineitem_join_blowup",
    "events_triangles", "doc_fuzzy_join", "doc_lsh_bucket_profile",
    "prices_overnight_intraday", "prices_vol_signature",
    "emb_pq_subspace_distortion", "doc_ngram_jaccard", "doc_top_terms",
    "emb_ivf_topk", "emb_cosine_neardup", "event_value_quantiles_approx",
    "q1_pricing_summary", "q3_shipping_priority", "q12_delay_priority",
    "display_snapshot", "media_audio_decode", "doc_simhash",
    "doc_eval_contamination", "doc_weighted_sample",
    "events_active_days_histogram", "events_entry_exit",
    "doc_dup_cluster_stats", "doc_lsh_pr_audit", "doc_lsh_calibration",
    "doc_sentence_dedup", "doc_incremental_dedup",
    "events_community_modularity", "trade_hits", "events_communities",
    "events_hll_distinct", "emb_ivf_recall", "emb_mmr_rerank",
    "emb_kcenter_sample", "media_audio_vad", "media_image_ahash",
    "prices_bollinger", "prices_atr", "emb_kmeans_gemm", "doc_langid",
    "doc_pack_chunks", "emb_label_centroids", "emb_hard_negatives",
    "emb_rp_project", "events_zorder_code", "orders_basket_affinity",
    "events_robust_outliers", "orders_merge_upsert", "doc_bigram_coverage",
    "events_hopping_10m", "events_interarrival",
    # r10 debuts rejoined at the r11 pre-insert cursor (index 134)
    "emb_pq_gemm", "emb_maxsim_gemm", "emb_maxsim_topk",
    "events_markov_stationary", "trade_neighbor_jaccard", "prices_garch_vol",
    "events_survival_km", "trade_bfs_hops", "doc_hybrid_rrf", "events_kcore",
    "media_scene_cuts", "media_audio_loudness", "prices_corr_matrix",
    "prices_stochastic", "events_dau_mau", "orders_rfm_segments",
    "doc_vocab_growth", "events_item_cf", "events_attribution",
    "events_seasonality",
    # r11 rotation slice starts here (pool[154:166], _ROTATION_STARTS[11]=154)
    "tpch_integrity", "doc_token_drift", "doc_quality_percentile",
    "events_wow_trending", "events_split_leakage", "events_burst_detect",
    "events_value_gini", "emb_split_drift", "prices_twap_daily",
    "events_eqdepth_histogram", "events_weighted_median",
    "events_incremental_agg",
    # r11 debuts rejoined at the r12 pre-insert cursor (index 166)
    "doc_emb_consensus_dedup", "events_graph_broadcast_audit",
    "trade_ppr", "doc_curation_funnel", "trade_closeness",
    "events_user_forest", "doc_containment", "trade_cheapest_path",
    "doc_winnow_overlap", "emb_pca_power", "emb_knn_outliers",
    "parts_abc_xyz", "prices_heikin_ashi", "emb_binary_recall",
    "prices_jump_detect", "doc_rake_keyphrases", "trade_assortativity",
    "orders_pareto_report", "events_bloom_prefilter", "prices_lead_lag",
    # r12 rotation slice starts here (pool[186:196], _ROTATION_STARTS[12]=186)
    "events_ab_lift", "doc_langid_confusion",
    "orders_cohort_ltv", "events_cuped_lift", "events_holt_forecast",
    "orders_benford_audit", "events_ks_split",
    "lineitem_quantity_model",
    "events_cusum_drift", "events_type_hour_assoc",
    "orders_duplicate_payments", "doc_cv_folds",
    "events_seq_pairs", "prices_obv",
    "doc_global_shuffle", 
    "events_rolling_wau",
    "prices_donchian", "doc_readability", "doc_ngram_novelty",
    "events_bot_screen", 
    
    "doc_boilerplate_screen",
    "orders_supplier_herfindahl", 
    "events_bounce_rate", "events_sequence_violations", "events_did_lift",
    "doc_dedup_by_source", "prices_amihud",
    "orders_benford_by_segment", "events_top_user_churn", 
    "orders_repeat_intervals", "events_position_attribution", 
    "events_slo_burn", "doc_sampling_plan", "events_stump_split",
    "lineitem_discount_elasticity",
    "events_growth_accounting", "emb_cluster_separation",
    "events_user_diversity", "events_key_skew",
    "doc_zipf_check", "orders_revenue_recognition", "prices_variance_ratio",
    "nation_trade_balance", "supply_lead_time", "events_mde_power",
    "parts_price_index", "prices_underwater_spells", "events_peak_concurrency",
    "prices_momentum_deciles", "prices_kelly", "events_hll_overlap",
    "supplier_scorecard", "events_srm_check", "events_depth_conversion",
    "prices_roll_spread", "events_seasonal_residuals", "media_binary_dedup",
    "trade_bottleneck_path", "doc_source_pair_dups", "prices_tail_ratio",
    "events_value_ab_welch", "parts_sourcing_depth", "media_audio_clipping",
    "prices_var_exceedances", "parts_brand_share_shift",
    "doc_simhash_bit_balance", "prices_gap_report",
    "customer_balance_activity_corr", "media_image_border",
    "orders_monthly_seasonal_index", "prices_corr_clusters",
    "lineitem_domain_audit", "doc_dup_length_bias", "events_session_fatigue",
    "prices_round_clustering", "emb_adc_recall", "emb_neardup_sweep",
    "events_simpson_check", "events_freshness_report", "prices_extreme_timing",
    "emb_storage_budget", "trade_graph_growth", "parts_price_realization",
    "prices_ljung_box", "doc_chars_per_token", "events_perceptron",
    "prices_higher_moments", "emb_pq_code_balance", "doc_cross_lang_dups",
    "parts_return_rates", "prices_idio_vol_share", "trade_degree_ccdf",
    "doc_prefix_clusters", "orders_split_shipments",
    "customer_repeat_by_segment", "doc_dedup_idempotence",
    "events_dormancy_histogram", "parts_price_dispersion",
    "events_neyman_allocation", "prices_spread_volume_corr",
    "events_poststrat_lift", "trade_rich_club", "doc_hapax_share",
    "emb_norm_audit", "prices_streaks", "trade_edge_retention",
    "events_experiment_report", "doc_dedup_savings", "events_variance_anova",
    "media_aspect_profile", "parts_one_time_share", "emb_effective_dim",
    "events_markov_fanout", "orders_first_vs_repeat",
    "doc_source_vocab_overlap", "doc_mixed_lang_screen", "doc_length_profile",
    "orders_deseasonalized_trend", "events_k_anonymity", "emb_exact_dups",
    "orders_quarter_end_loading", "doc_term_burstiness",
    "orders_total_reconciliation", "events_alert_threshold_sweep",
    "prices_golden_cross", "events_mann_kendall", "media_size_outliers",
    "supply_lead_time_trend", "events_new_user_share", "orders_aov_trend",
    "prices_variance_break", "trade_preferential_attachment",
    "customer_debt_cohort", "events_activity_streaks",
    "supplier_lead_variability", "orders_priority_slas", "orders_peak_to_mean",
    "doc_vocab_coverage_curve", "emb_ivf_list_purity", "prices_beta_stability",
    "trade_components", "doc_char_gini", "emb_distance_histogram",
    "region_revenue_trend", "events_type_cooccurrence",
    "events_user_hhi_weekly", "orders_priority_mix_drift",
    # r12-built batch 66 (r13 debut candidates)
    "events_core_number", "events_bot_ring_screen",
]

def current_window() -> list[str]:
    """The 50 query names the driver will verify this round, per the
    rotation policy above."""
    n_rotating = DRIVER_WINDOW - len(FIXED_CORE) - len(NEW_THIS_ROUND)
    if n_rotating < 0:
        raise RuntimeError("too many debuts for the window")
    start = _ROTATION_STARTS[ROTATION_ROUND] % len(ROTATION_POOL)
    wrapped = ROTATION_POOL[start:] + ROTATION_POOL[:start]
    return FIXED_CORE + NEW_THIS_ROUND + wrapped[:n_rotating]


def _apply_priority_order() -> None:
    window = current_window()
    pool_names = set(FIXED_CORE) | set(NEW_THIS_ROUND) | set(ROTATION_POOL)
    missing = [n for n in pool_names if n not in SPARK_QUERIES]
    if missing:
        raise RuntimeError(f"rotation names not registered: {sorted(missing)}")
    unlisted = [n for n in SPARK_QUERIES if n not in pool_names]
    if unlisted:
        raise RuntimeError(
            f"registered queries missing from rotation policy: {unlisted}"
        )
    if len(window) != DRIVER_WINDOW:
        raise RuntimeError(f"window has {len(window)} names, expected {DRIVER_WINDOW}")
    if len(set(window)) != DRIVER_WINDOW:
        # a debut left in the pool's live slice (or a core/pool
        # overlap) would otherwise dedupe silently below, shrinking
        # the certified window to 49 and promoting an arbitrary next
        # query into the driver's gate
        dups = sorted({n for n in window if window.count(n) > 1})
        raise RuntimeError(f"window contains duplicates: {dups}")
    ordered = {n: SPARK_QUERIES[n] for n in window}
    ordered.update((n, f) for n, f in SPARK_QUERIES.items() if n not in ordered)
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(ordered)
    sql_ordered = {n: ORACLE_SQL[n] for n in SPARK_QUERIES if n in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(sql_ordered)


_apply_priority_order()
