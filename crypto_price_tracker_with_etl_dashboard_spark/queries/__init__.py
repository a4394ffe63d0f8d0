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
#
#   FIXED_CORE       — reference parity (7) + the training-data
#                      pipeline surface: certified EVERY round.
#                      30 through r5, slimmed 30->26 mid-r6 and
#                      26->22 in r7 (always-green zero-shuffle
#                      members whose operator family stays covered
#                      move into the pool; r6/r7 verdict ask).
#   debuts + rotation
#                    — queries NEW this round debut at the head (new
#                      work must always earn driver evidence in its
#                      own round, r2 rule), then the next slots of
#                      ROTATION_POOL.  The cursor starts where the
#                      previous round STOPPED (_ROTATION_STARTS
#                      records actual consumption; a round with d
#                      debuts consumes 50 - |FIXED_CORE| - d slots).
#                      Everything stays registered and runs in
#                      bench.py and tools/check_oracle.py (ALL
#                      queries, not just the window) every round.
#
# Per-round consumption history, the full batch ledger (which round
# built each query batch, what it certifies), and the uncertified-
# queue burn-down live in COVERAGE.md ("Rotation & certification
# ledger").  Only the live cursor arithmetic is kept here.
#
# r7 (this round): the four r6 debuts joined the pool AT the r7
# cursor (index 26, the move every debut cohort makes — they are
# r6-certified, so they sit in the consumed region and re-certify
# after a full loop); the cursor skips past them: start 26 + 4 = 30.
# FIXED_CORE slimmed 26 -> 22 (doc_simhash, doc_langid,
# doc_pack_chunks, emb_label_centroids — all r6-certified — moved to
# the pool after the r5-certified region, in staleness order), which
# funds FOUR extra debut slots: r7 debuts TWELVE never-certified
# candidates (the eight the r6 verdict named plus prices_ema_macd,
# doc_simhash_neardup — verdict ask #5's highest-leverage pair —
# trade_pagerank and events_heavy_hitters).  Rotation slots =
# 50 - 22 - 12 = 16 = pool[30:46] — EXACTLY the r4-certified stale
# block (events_tumbling_5min .. emb_kmeans), leaving no driver row
# older than r5 anywhere.
#
# r8 PLAN: insert the twelve r7 debuts at the cursor (index 46,
# before doc_token_bpe) and set _ROTATION_STARTS[8] = 58.  With 12
# debuts the 16 rotation slots are pool[58:74] — the r5-certified
# doc_token_bpe/doc_fingerprint/doc_winnow/doc_hash_split +
# events_cube .. media_audio_decode region (the oldest evidence
# left).  Keep debuts at >= builds so the uncertified queue keeps
# shrinking (burn-down ledger in COVERAGE.md).
# ---------------------------------------------------------------------------

DRIVER_WINDOW = 50
ROTATION_ROUND = 7  # bump each round; indexes _ROTATION_STARTS
_ROTATION_STARTS = {3: 0, 4: 18, 5: 38, 6: 6, 7: 30}

FIXED_CORE: list[str] = [
    # reference parity core (7)
    "latest_snapshot", "history_slice", "topk_other", "market_share",
    "distinct_symbols", "ingest_normalize", "prices_ohlc_5min",
    # deduplication family (5; doc_simhash rotated r7 — zero-shuffle
    # bit expression, and the banded-Hamming join built on it debuts
    # this round as doc_simhash_neardup)
    "doc_exact_dedup", "doc_minhash_lsh", "doc_ngram_jaccard",
    "doc_dup_clusters", "doc_decontaminate",
    # text-analysis family (2; doc_langid rotated r7 — always-green
    # zero-shuffle column expression, family covered by doc_quality /
    # doc_top_terms; doc_token_bpe / doc_fingerprint / doc_winnow
    # rotated r6 on the same rationale)
    "doc_quality", "doc_top_terms",
    # sampling / packing family (2; doc_pack_chunks rotated r7 —
    # deterministic bucketed prefix sums, always green; doc_hash_split
    # rotated r6 — stratified sample + per-user cap keep the family)
    "doc_stratified_sample", "events_per_user_cap",
    # similarity-search family (4; emb_label_centroids rotated r7 —
    # broadcast centroid attach, family covered by the 4 here plus
    # the emb_semdedup / emb_knn_classify debuts)
    "emb_cosine_topk", "emb_ann_recall", "emb_ivf_topk",
    "emb_cosine_neardup",
    # multimodal family (2)
    "media_decode", "media_frame_sample",
]

# Queries registered for the FIRST time this round: they debut inside
# the window (r2 verdict: new operators must not land outside the
# correctness gate), then join ROTATION_POOL next round.  The twelve
# r7 debuts are the r6-built candidates the r6 verdict named (asks
# #1/#5): financial indicators, funnel, SemDeDup, kNN-classify,
# behavior outliers/profile, the Arrow-streamed EMA/MACD integer
# recursion, SimHash banded-Hamming near-dup, PageRank, and the
# count-min heavy hitters.
NEW_THIS_ROUND: list[str] = [
    "prices_vwap_hourly", "prices_rsi", "prices_max_drawdown",
    "events_funnel", "emb_semdedup", "emb_knn_classify",
    "events_value_outliers", "events_profile",
    "prices_ema_macd", "doc_simhash_neardup",
    "trade_pagerank", "events_heavy_hitters",
]

ROTATION_POOL: list[str] = [
    # --- never driver-checked before r3: first in cycle ---
    "q11_important_stock", "emb_ann_lsh",
    # --- r5 debuts: joined the pool at the (r6) cursor position, so
    #     they sit in the consumed region and recycle a full loop on ---
    "emb_pq_quantize", "emb_pq_adc_topk", "doc_bm25_topk",
    "events_retention_cohorts",
    # --- TPC-H tail (r1-green, evicted from the r2 window) ---
    "q2_min_cost_supplier", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_diversity",
    "q17_small_quantity", "q18_large_volume", "q19_disjunctive_revenue",
    "q20_heavy_shippers", "q21_last_shipper", "q22_idle_balance",
    # --- remaining time-series / window-shape queries ---
    "top_orders_per_customer", "segment_order_stats",
    # --- r6 debuts: joined the pool at the (r7) cursor position, so
    #     they sit in the consumed region and recycle a full loop on ---
    "emb_ivfadc_topk", "emb_gemm_audit", "events_salted_join",
    "orders_bucketed_join",
    # --- the r4-certified stale block: r7 rotation = pool[30:46] =
    #     exactly these sixteen ---
    "events_tumbling_5min", "prices_change_points",
    # --- relational / OLAP operator families (in the r2 window) ---
    "events_sessionize", "events_asof_join", "events_range_join",
    "events_moving_stats", "events_daily_pivot", "events_unpivot",
    "prices_validity_intervals", "orders_rollup",
    # --- r4 debuts: joined the pool at the (r5) cursor position, so
    #     they sit in the consumed region and recycle a full loop on ---
    "media_image_decode", "doc_pii_scrub", "doc_repetition",
    "emb_scalar_quantize", "doc_mixture_sample", "emb_kmeans",
    # --- slimmed out of FIXED_CORE mid-r6 (r5-certified there every
    #     round through r5; always-green zero-shuffle column
    #     expressions) — placed at the head of the r5-certified
    #     region so rotation re-reaches them in staleness order ---
    "doc_token_bpe", "doc_fingerprint", "doc_winnow", "doc_hash_split",
    # --- r5 cursor started here (index 38 pre-slimming) ---
    "events_cube",
    "returned_orders_semi", "churned_customers_anti", "user_cohort_setops",
    "events_json_extract", "daily_distinct_users",
    "daily_approx_distinct_users", "event_value_quantiles",
    "event_value_quantiles_approx",
    # --- representative TPC-H compositions (in the r2 window) ---
    "q1_pricing_summary", "q3_shipping_priority", "q12_delay_priority",
    # --- r3 debuts, joined the pool in r4 ---
    "display_snapshot", "media_audio_decode",
    # --- slimmed out of FIXED_CORE in r7 (r6-certified there every
    #     round through r6; always-green zero-shuffle / broadcast-
    #     attach members whose families stay covered) — placed after
    #     the r5-certified region so rotation re-reaches them in
    #     staleness order ---
    "doc_simhash", "doc_langid", "doc_pack_chunks", "emb_label_centroids",
    # --- everything below is the r6-built, never-driver-certified
    #     candidate queue (burn-down ledger in COVERAGE.md; all
    #     check_oracle-certified at sf0.01 AND sf0.1).  Future rounds
    #     MOVE each round's debut picks into NEW_THIS_ROUND
    #     (debut-in-window rule), then re-insert them into the pool
    #     at the next round's cursor.  Twelve moved out in r7. ---
    "events_top_paths", "events_markov", "doc_bigram_topk",
    "events_grouping_sets", "events_histogram", "emb_dim_stats",
    # --- per-series OLS trend from exact fixed-point sums ---
    "prices_trend",
    # --- r6-built batch 4, same debut-candidate status: degree-
    #     oriented triangle counting + clustering coefficients over
    #     the user co-occurrence graph (operators/triangles.py), and
    #     the q-gram + Levenshtein fuzzy key join
    #     (functions/dedup.py::fuzzy_key_pairs) ---
    "events_triangles", "doc_fuzzy_join", "emb_hard_negatives",
    "emb_rp_project", "events_communities", "media_image_ahash",
    "events_zorder_code", "orders_basket_affinity",
    "events_robust_outliers", "orders_merge_upsert",
    "doc_bigram_coverage", "events_hopping_10m", "events_interarrival",
    "events_user_forest", "tpch_integrity",
    # --- r6-built batch 6, same debut-candidate status: the
    #     Bollinger / stochastic overlays and the top-N daily-return
    #     correlation matrix (operators/indicators.py), token-
    #     distribution drift between hash-splits, per-language
    #     quality-percentile curation, hour-of-day seasonality,
    #     week-over-week trending, and the row-level-split leakage
    #     report. ---
    "prices_bollinger", "prices_stochastic", "prices_corr_matrix",
    "doc_token_drift", "doc_quality_percentile", "events_seasonality",
    "events_wow_trending", "events_split_leakage",
    # --- r6-built batch 7, same debut-candidate status: last-touch
    #     attribution, sliding-window burst detection, Gini value
    #     concentration, and embedding-space split drift. ---
    "events_attribution", "events_burst_detect", "events_value_gini",
    "emb_split_drift",
    # --- r6-built batch 8: daily TWAP, RFM segmentation, equi-depth
    #     histogram, and the portable-Bloom semi-join prefilter. ---
    "prices_twap_daily", "orders_rfm_segments", "events_eqdepth_histogram",
    "events_bloom_prefilter",
    # --- r6-built batch 9: asymmetric containment dedup, k-core
    #     decomposition, farthest-point diverse sampling. ---
    "doc_containment", "events_kcore", "emb_kcenter_sample",
    "events_weighted_median", "events_incremental_agg",
    "events_ab_lift", "prices_jump_detect", "doc_langid_confusion",
    "emb_maxsim_topk", "orders_cohort_ltv", "prices_heikin_ashi",
    "events_cuped_lift", "events_holt_forecast", "doc_curation_funnel",
    "orders_pareto_report", "doc_lsh_calibration",
    # --- r6-built batch 15, same debut-candidate status: Kaplan-Meier
    #     weekly survival (operators/survival.py — the FOURTH certified
    #     arbitrary-length integer recursion), multi-hop BFS shortest
    #     hops over the trade graph (operators/bfs.py), the portable
    #     HyperLogLog distinct sketch with per-day build + register
    #     merge (functions/sketch.py::hll_*), lead-lag cross-
    #     correlation between symbols (operators/indicators.py), and
    #     reciprocal-rank-fusion hybrid retrieval (BM25 x cosine). ---
    "events_survival_km", "trade_bfs_hops", "events_hll_distinct",
    "prices_lead_lag", "doc_hybrid_rrf",
    # --- r6-built batch 16, same debut-candidate status: Bellman-Ford
    #     weighted cheapest paths (visited pruning unsound under
    #     weights — certifies the full relaxation shape), the
    #     Matryoshka prefix-dim recall audit (hard integer verdict on
    #     every figure), the Benford first-digit forensic audit, the
    #     binned two-sample KS test between hash splits, and per-group
    #     exact-percentile winsorization. ---
    "trade_cheapest_path", "emb_matryoshka_recall", "orders_benford_audit",
    "events_ks_split", "events_winsorize",
    # --- r6-built batch 17, same debut-candidate status: DAU/MAU
    #     stickiness, annualized Sharpe ratio, closed-form two-feature
    #     OLS from ten exact sufficient statistics (one shared
    #     expression string on both engines), integer-exact CUSUM
    #     drift detection, and Cramér's V type x hour association. ---
    "events_dau_mau", "prices_sharpe", "lineitem_quantity_model",
    "events_cusum_drift", "events_type_hour_assoc",
    # --- r6-built batch 18, same debut-candidate status: power-
    #     iteration top principal direction (ppm-quantized exact
    #     integer sums per round, unrolled-CTE oracle), conversion-
    #     latency percentiles on distributed exact rank, duplicate-
    #     payment fraud screen, stratified k-fold assignment report,
    #     and RAKE keyphrase extraction (gaps-and-islands phrases). ---
    "emb_pca_power", "events_conversion_latency", "orders_duplicate_payments",
    "doc_cv_folds", "doc_rake_keyphrases",
    # --- r6-built batch 19, same debut-candidate status: personalized
    #     PageRank (teleport mass on the source), incremental JOIN
    #     maintenance (IVM delta rule, merge == recompute oracle),
    #     Heaps-law vocabulary-growth curve, and item-item
    #     collaborative filtering (binary-cosine, capped pair stage). ---
    "trade_ppr", "orders_incremental_join", "doc_vocab_growth",
    "events_item_cf",
    # --- r6-built batch 20, same debut-candidate status: gap-allowed
    #     sequential-pattern support (A-before-B user counts — the
    #     non-adjacent complement of events_markov), incremental
    #     corpus dedup (delta-vs-base fingerprint screen with a
    #     recompute-equivalence verdict column), winnowing span
    #     overlap (plagiarism-style shared-fingerprint pairs), Wilder
    #     ATR (the certified integer-recursion family), and
    #     multi-source harmonic closeness over the trade graph. ---
    "events_seq_pairs", "doc_incremental_dedup", "doc_winnow_overlap",
    "prices_atr", "trade_closeness",
    # --- r6-built batch 21, same debut-candidate status: HITS hubs &
    #     authorities over the DIRECTED supplier->customer half graph
    #     (operators/hits.py — overflow-safe quantized-divisor L1
    #     normalization, unrolled-CTE oracle), On-Balance Volume
    #     (integer-cent cumulative fold with path extrema), chi-square
    #     term-label feature selection, the deterministic global
    #     shuffle + shard assignment (rank.py-style parallel ranks vs
    #     DuckDB's partitioned row_number), and the IVF recall audit
    #     (the quality gate emb_ann_recall gives LSH, at nprobe=2). ---
    "trade_hits", "prices_obv", "doc_chi2_terms", "doc_global_shuffle",
    "emb_ivf_recall",
    # --- r6-built batch 22, same debut-candidate status: 1-bit binary
    #     quantization retrieval (sign bits packed into two 32-bit
    #     BIGINT words, Hamming = popcount(xor) — integer-exact end to
    #     end), MMR diversified re-ranking (greedy 5-round unroll over
    #     the certified cosine pool), the seasonal-naive forecast
    #     backtest (integer-ppm MAPE per symbol), the open-order
    #     backlog sweep line (year-bucketed prefix sum, no
    #     partitionless window), and exact rolling 7-day WAU
    #     (contribution expansion — sliding distinct without a
    #     COUNT(DISTINCT) frame). ---
    "emb_binary_topk", "emb_mmr_rerank", "prices_backtest_naive",
    "orders_backlog_series", "events_rolling_wau",
    # --- r6-built batch 23, same debut-candidate status: frame-energy
    #     audio VAD profile (real WAV framing through mapInPandas,
    #     closed-form oracle), Donchian channel breakouts, Newman
    #     degree assortativity (exact sufficient statistics, one
    #     shared Pearson expression), Flesch-style readability from
    #     three integer counts, and the kNN-density novelty screen
    #     (label-blocked pairs, ppm-quantized order-free mean). ---
    "media_audio_vad", "prices_donchian", "trade_assortativity",
    "doc_readability", "emb_knn_outliers",
    # --- r6-built batch 24, same debut-candidate status: n-gram
    #     novelty/memorization screen (corpus-unique shingle share),
    #     behavioral bot screen (peak-hour rate, sub-second follow-up
    #     share, type concentration — all integer/ppm), volume-at-
    #     price profile (10 equal bands per symbol, exact cent sums),
    #     centroid-margin label-noise screen (own-vs-nearest-other
    #     centroid distance, relabel suggestion), and the customer
    #     spend-band migration matrix (year-over-year transitions
    #     with new/churned edges). ---
    "doc_ngram_novelty", "events_bot_screen", "prices_volume_profile",
    "emb_centroid_margin", "orders_customer_migration",
    # --- r6-built batch 25, same debut-candidate status: per-channel
    #     pixel histogram through the real BMP decoder (every pixel
    #     must land in the right band), neighbor-overlap Jaccard
    #     supplier similarity (posting join with the stop-key cap),
    #     point-in-time open-order aging buckets, license/boilerplate
    #     marker tally (single-scan stack), and per-nation supplier
    #     revenue Herfindahl concentration (ppm shares squared). ---
    "media_image_histogram", "trade_neighbor_jaccard",
    "orders_aging_report", "doc_boilerplate_screen",
    "orders_supplier_herfindahl",
    # --- r6-built batch 26, same debut-candidate status: exact
    #     historical VaR (k-th order statistic, no interpolation),
    #     session bounce rate over the batch gap-sessionization,
    #     sentence-level dedup share (the C4 granularity), funnel-
    #     order sequence violations, and the dup-cluster size
    #     histogram (dedup observability). ---
    "prices_var_historical", "events_bounce_rate", "doc_sentence_dedup",
    "events_sequence_violations", "doc_dup_cluster_stats",
    # --- r6-built batch 27, same debut-candidate status: GARCH(1,1)
    #     conditional volatility (the SIXTH certified integer
    #     recursion — Arrow fold + WITH RECURSIVE twin), difference-
    #     in-differences lift (the third causal estimator), exact-
    #     dedup rate per (source, lang) stratum, and the IVF
    #     list-balance index-health report on the integer micro-grid
    #     quantizer. ---
    "prices_garch_vol", "events_did_lift", "doc_dedup_by_source",
    "emb_ivf_list_balance",
    # --- r6-built batch 28, same debut-candidate status: the binary-
    #     tier recall audit (exact top-k overlap, no tunable floor),
    #     Amihud illiquidity (per-tick integer ratio, order-free
    #     mean), the per-segment Benford forensic screen (ppm chi-
    #     square cells), and daily top-10 leaderboard churn. ---
    "emb_binary_recall", "prices_amihud", "orders_benford_by_segment",
    "events_top_user_churn",
    # --- r6-built batch 29, same debut-candidate status: the LSH
    #     precision/recall audit against exact-Jaccard ground truth,
    #     predicate-filtered vector search (pre-filter, not
    #     post-filter), repeat-purchase cadence (exact median gaps
    #     bucketed by week), and U-shaped position-based attribution
    #     (remainder-exact integer ppm credits). ---
    "doc_lsh_pr_audit", "emb_filtered_topk", "orders_repeat_intervals",
    "events_position_attribution",
    # --- r6-built batch 30, same debut-candidate status: CAPM beta vs
    #     the equal-weight market (five exact sufficient statistics,
    #     shared OLS-slope expression), SLO error-budget burn with a
    #     date-spine running sum, the corpus sampling-plan report
    #     (rates + centi-epochs vs fixed mixture targets), and the
    #     ABC/XYZ inventory matrix (distributed exact revenue rank x
    #     weekly-demand cv). ---
    "prices_beta", "events_slo_burn", "doc_sampling_plan",
    "parts_abc_xyz",
    # --- r6-built batch 31, same debut-candidate status: Newman
    #     modularity of the LPA partition (per-community ppm terms,
    #     floor-before-sum), the decision-stump split search (exact
    #     Gini impurity argmax — the tree-learner inner loop), the
    #     pairs-trading spread monitor (integer cross-multiplied
    #     2-sigma flag, no float std), and the discount-elasticity
    #     band view. ---
    "events_community_modularity", "events_stump_split",
    "prices_pair_spread", "lineitem_discount_elasticity",
    # --- r6-built batch 32, same debut-candidate status: weekly
    #     growth accounting (new/retained/resurrected/churned — the
    #     why-did-actives-move decomposition), the journey Markov
    #     chain's stationary distribution (unrolled integer power
    #     iteration), Davies-Bouldin-style cluster separation on the
    #     micro grid, and the weekday return-anomaly screen. ---
    "events_growth_accounting", "events_markov_stationary",
    "emb_cluster_separation", "prices_weekday_effect",
    # --- r6-built batch 33, same debut-candidate status: inverse-
    #     Simpson behavioral diversity (effective event types per
    #     user, exact-integer alternative to entropy), the join-key
    #     skew report (the pre-join diagnostic that decides when
    #     operators/skew.py's salting is worth it), the Zipf
    #     rank-frequency corpus-health check, monthly revenue
    #     recognition (exact-cents proration via month-sequence
    #     explode), and the Lo-MacKinlay variance-ratio
    #     market-efficiency test on non-overlapping blocks. ---
    "events_user_diversity", "events_key_skew", "doc_zipf_check",
    "orders_revenue_recognition", "prices_variance_ratio",
    # --- r6-built batch 34, same debut-candidate status: nation
    #     export/import trade balance (two independent fixed-point
    #     fact aggregations), exact lead-time median/p90 per supplier
    #     nation via count-bucket order statistics (no percentile
    #     interpolation), experiment sizing (MDE -> users-per-arm at
    #     80% power from the exact baseline conversion), the
    #     Laspeyres parts price index (base-year basket at
    #     cent-exact unit prices), and drawdown DURATION spells
    #     (gaps-and-islands under the running max). ---
    "nation_trade_balance", "supply_lead_time", "events_mde_power",
    "parts_price_index", "prices_underwater_spells",
    # --- r6-built batch 35, same debut-candidate status: peak
    #     concurrent sessions per day (sweep line with the backlog
    #     series' bucketed prefix-sum discipline), cross-sectional
    #     momentum quintiles (trailing-return ntile -> mean forward
    #     return), Kelly-criterion position sizing from exact return
    #     moments, the HLL inclusion-exclusion overlap audit (the
    #     mergeable-sketch answer to |A∩B| without a rescan), and the
    #     supplier scorecard (volume / cent-exact revenue / on-time
    #     SLA / revenue share, top-20). ---
    "events_peak_concurrency", "prices_momentum_deciles", "prices_kelly",
    "events_hll_overlap", "supplier_scorecard",
    # --- r6-built batch 36, same debut-candidate status: the
    #     sample-ratio-mismatch gate (integer chi-square vs the 3.841
    #     critical value — the validity check every lift readout
    #     assumes), conversion by session depth, Roll's implied
    #     bid-ask spread from lag-1 serial covariance (IEEE sqrt is
    #     correctly rounded, hence portable), seasonal-residual
    #     anomaly cells vs the additive hour+weekday expectation, and
    #     binary checksum dedup over the multimodal payload column. ---
    "events_srm_check", "events_depth_conversion", "prices_roll_spread",
    "events_seasonal_residuals", "media_binary_dedup",
    # --- r6-built batch 37, same debut-candidate status: widest
    #     (maximum-bottleneck) trade route — the (max, min) semiring
    #     swap of Bellman-Ford, video scene-cut detection (per-video
    #     lag window over the exploded frame plan), the cross-source
    #     near-dup matrix over the certified LSH pairs (which feeds
    #     overlap), exact p95/|p05| return tail ratio via count-bucket
    #     order statistics, and Welch's unequal-variance t on per-user
    #     purchase spend (the continuous-metric A/B read). ---
    "trade_bottleneck_path", "media_scene_cuts", "doc_source_pair_dups",
    "prices_tail_ratio", "events_value_ab_welch",
    # --- r6-built batch 38, same debut-candidate status: sourcing-
    #     depth exposure bands (revenue by distinct-supplier count),
    #     the REAL-decode audio clipping screen (full-scale
    #     sample share through the stdlib wave kernel), out-of-sample
    #     VaR exceedance backtest with the Kupiec binomial test as
    #     one integer cross-multiplication, and YoY brand share-shift
    #     top movers. ---
    "parts_sourcing_depth", "media_audio_clipping",
    "prices_var_exceedances", "parts_brand_share_shift",
    # --- r6-built batch 39, same debut-candidate status: SimHash
    #     bit-balance index-health audit, per-symbol tick-coverage
    #     gap report, customer balance-vs-activity Pearson r (zero-
    #     order customers kept via left join), border-vs-interior
    #     image screen through the real BMP parse, and the monthly
    #     seasonal demand index. ---
    "doc_simhash_bit_balance", "prices_gap_report",
    "customer_balance_activity_corr", "media_image_border",
    "orders_monthly_seasonal_index",
    # --- r6-built batch 40, same debut-candidate status: correlated-
    #     symbol clusters (certified corr matrix -> LPA communities),
    #     the lineitem value-domain contract audit, the dedup
    #     length-bias audit (does exact dedup skew corpus length?),
    #     within-session fatigue curve, and round-number price
    #     clustering (binomial z as integer cross-multiplication). ---
    "prices_corr_clusters", "lineitem_domain_audit",
    "doc_dup_length_bias", "events_session_fatigue",
    "prices_round_clustering",
    # --- r6-built batch 41, same debut-candidate status: the ADC
    #     recall audit (completes the recall family), near-dup
    #     threshold sweep (three taus from one pair pass), the
    #     Simpson's-paradox mix-confounding screen (all-integer lift
    #     signs), the event-stream freshness monitor, and intraday
    #     extreme-print timing. ---
    "emb_adc_recall", "emb_neardup_sweep", "events_simpson_check",
    "events_freshness_report", "prices_extreme_timing",
    # --- r6-built batch 42, same debut-candidate status: the vector-
    #     index storage budget (bytes/footprint/compression per tier,
    #     derived from the registered tier constants), trade-graph
    #     growth by quarter, list-vs-street price realization by
    #     brand, the Ljung-Box joint autocorrelation test (lags 1-3,
    #     one 3-lag window pass), and tokenizer chars-per-token by
    #     source. ---
    "emb_storage_budget", "trade_graph_growth", "parts_price_realization",
    "prices_ljung_box", "doc_chars_per_token",
    # --- r6-built batch 43, same debut-candidate status: the batch
    #     perceptron trained in-engine with exact integer weights
    #     (unrolled 3-round oracle — the first CLASSIFIER the driver
    #     certifies end to end), higher return moments
    #     (skewness/excess kurtosis from exact power sums), the PQ
    #     code-balance index-health audit, the cross-language
    #     near-dup false-positive audit, and the brand return-rate
    #     league. ---
    "events_perceptron", "prices_higher_moments", "emb_pq_code_balance",
    "doc_cross_lang_dups", "parts_return_rates",
    # --- r6-built batch 44, same debut-candidate status:
    #     idiosyncratic-vs-systematic volatility share (R^2 against
    #     the equal-weight market), the supplier degree CCDF
    #     tail-shape read, prefix template mining (the cheapest
    #     boilerplate detector), the split-shipment consolidation
    #     profile, and repeat-purchase rate by market segment. ---
    "prices_idio_vol_share", "trade_degree_ccdf", "doc_prefix_clusters",
    "orders_split_shipments", "customer_repeat_by_segment",
    # --- r6-built batch 45, same debut-candidate status: the dedup
    #     idempotence property audit (dedup of survivors removes
    #     nothing), the dormancy-length histogram (winback timing),
    #     intra-month unit-price dispersion, Neyman sampling
    #     allocation (integer-quantized weights, order-proof), and
    #     the Roll-spread-vs-volume microstructure correlation. ---
    "doc_dedup_idempotence", "events_dormancy_histogram",
    "parts_price_dispersion", "events_neyman_allocation",
    "prices_spread_volume_corr",
    # --- r6-built batch 46, same debut-candidate status: the post-
    #     stratified lift (fourth causal estimator — removes the mix
    #     confound the Simpson screen detects), the bipartite
    #     rich-club density (do hubs trade with each other?), hapax
    #     vocabulary share, the embedding norm audit (are vectors
    #     unit-norm? exact milli order statistics), and up/down
    #     streak extremes. ---
    "events_poststrat_lift", "trade_rich_club", "doc_hapax_share",
    "emb_norm_audit", "prices_streaks",
    # --- r6-built batch 47, same debut-candidate status: quarter-
    #     over-quarter trade-edge retention (the churn side of graph
    #     growth), the one-row experiment readout composing the four
    #     certified estimators (SRM / Simpson / post-strat lift /
    #     Welch), dedup storage savings, the between-vs-within user
    #     ANOVA (eta^2), and the image aspect-ratio profile through
    #     the real BMP header parse. ---
    "trade_edge_retention", "events_experiment_report",
    "doc_dedup_savings", "events_variance_anova", "media_aspect_profile",
    # --- r6-built batch 48, same debut-candidate status: one-time
    #     parts long-tail share, the participation-ratio effective
    #     dimensionality (representation-collapse smell), Markov
    #     effective fan-out (how deterministic is each journey
    #     state?), first-vs-repeat order value, and top-100
    #     vocabulary overlap per source pair. ---
    "parts_one_time_share", "emb_effective_dim", "events_markov_fanout",
    "orders_first_vs_repeat", "doc_source_vocab_overlap",
    # --- r6-built batch 49, same debut-candidate status: the mixed-
    #     language half-foreign screen (code-switching/concatenation
    #     bugs), per-language length profile (count-bucket order
    #     statistics), deseasonalized order trend (index-adjusted OLS
    #     slope), the behavioral k-anonymity privacy audit, and
    #     exact-duplicate vector detection (micro-quantized
    #     fingerprints — portable where float formatting is not). ---
    "doc_mixed_lang_screen", "doc_length_profile",
    "orders_deseasonalized_trend", "events_k_anonymity", "emb_exact_dups",
    # --- r6-built batch 50, same debut-candidate status: quarter-end
    #     loading forensics (binomial z as integer cross-mult),
    #     Church-Gale term burstiness (VMR over the dense doc grid),
    #     invoice-total reconciliation (does o_totalprice equal its
    #     line charges?), the alert threshold sweep, and golden/death
    #     cross counts (cross-multiplied frame sums, means never
    #     materialize). ---
    "orders_quarter_end_loading", "doc_term_burstiness",
    "orders_total_reconciliation", "events_alert_threshold_sweep",
    "prices_golden_cross",
    # --- r6-built batch 51, same debut-candidate status: the
    #     Mann-Kendall nonparametric trend test (all-integer verdict
    #     over the O(days^2) day-pair grid), payload-size outliers,
    #     the quarterly lead-time trendline, new-user traffic share
    #     by week, and the AOV trend. ---
    "events_mann_kendall", "media_size_outliers", "supply_lead_time_trend",
    "events_new_user_share", "orders_aov_trend",
    # --- r6-built batch 52, same debut-candidate status: the
    #     variance-break (volatility regime) F-test, the
    #     preferential-attachment network-formation test, the
    #     negative-balance credit cohort, activity-streak histogram
    #     (habit formation), and the supplier lead-time IQR
    #     variability league. ---
    "prices_variance_break", "trade_preferential_attachment",
    "customer_debt_cohort", "events_activity_streaks",
    "supplier_lead_variability",
    # --- r6-built batch 53, same debut-candidate status: per-
    #     priority shipping SLA medians with the priority-inversion
    #     flag, peak-to-mean capacity ratio, the vocabulary coverage
    #     curve (which feeds add words vs volume), IVF list label
    #     purity, and split-half beta stability. ---
    "orders_priority_slas", "orders_peak_to_mean",
    "doc_vocab_coverage_curve", "emb_ivf_list_purity",
    "prices_beta_stability",
    # --- r6-built batch 54, same debut-candidate status: repeat-trade
    #     connected components (the WCC certification on a SECOND,
    #     relationally-derived graph — w>=2 keeps it sparse), audio
    #     RMS/crest loudness through the real WAV kernel, the log-free
    #     character-Gini diversity screen, the pairwise cosine-distance
    #     histogram (representation contrast; mod-sampled pairs), and
    #     the region revenue YoY trend. ---
    "trade_components", "media_audio_loudness", "doc_char_gini",
    "emb_distance_histogram", "region_revenue_trend",
    # --- r6-built batch 55, same debut-candidate status: daily-basket
    #     event-type co-occurrence lift (the log-free PMI surrogate at
    #     the user-day grain), the weekly user-concentration HHI with
    #     effective-user reciprocal (whale/bot dominance monitor), and
    #     the order-priority mix-drift audit (integer ppm shares, no
    #     order-dependent chi-square float sum). ---
    "events_type_cooccurrence", "events_user_hhi_weekly",
    "orders_priority_mix_drift",
    # --- r7-built batch 56, r8+ debut candidates: keep-best dedup
    #     survivor selection (the RefinedWeb keep-longest rule over
    #     the certified LSH->components clusters), the bigram-LM OOV
    #     quality score (log-free CCNet-style model-based filtering:
    #     train-split bigram vocabulary, valid-split ppm OOV), and
    #     the rolling 7-day WAU from mergeable per-day HLL sketches
    #     (the sliding-distinct shape that never rescans the fact
    #     table). ---
    "doc_keep_best_dedup", "doc_ngram_lm_hit_rate",
    "events_hll_rolling_wau",
    # --- r7-built batch 57, r8+ debut candidates: cross-video
    #     duplicate-frame detection (frame-level dedup between the
    #     payload-checksum and whole-image granularities — explode ->
    #     fingerprint -> one bounded shuffle) and view-to-purchase
    #     abandonment (the forward conditional-min "next matching
    #     event" window — one user-key shuffle, no self/range
    #     join). ---
    "media_frame_dups", "events_abandonment",
    # --- r7-built batch 58, r8+ debut candidates: the near-dup pair
    #     transitivity audit (wedge-closure rate over the certified
    #     LSH pair graph — decides CC vs pairwise dedup policy) and
    #     the join-blowup pre-flight estimator (predicted self-join
    #     cardinality from the key histogram — the broadcast / salt /
    #     bucket decision input, no join executed). ---
    "doc_dup_transitivity", "lineitem_join_blowup",
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
    ordered = {n: SPARK_QUERIES[n] for n in window}
    ordered.update((n, f) for n, f in SPARK_QUERIES.items() if n not in ordered)
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(ordered)
    sql_ordered = {n: ORACLE_SQL[n] for n in SPARK_QUERIES if n in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(sql_ordered)


_apply_priority_order()
