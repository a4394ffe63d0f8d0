"""Physical-plan regression tests: the 100 TB story depends on plan
SHAPE (pushdown, broadcast, shuffle count), not just row-level
correctness — these pin the shapes so a refactor that silently
de-optimizes a plan fails CI."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions import dedup as D
from crypto_price_tracker_with_etl_dashboard_spark.functions import similarity as S
from crypto_price_tracker_with_etl_dashboard_spark.sources import fan_out, load_table
from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_column_pushdown(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    q = docs.filter(F.col("doc_id") < 10).select("doc_id")
    plan = plan_of(q)
    assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan
    # column pruning: the scan must not read the text column
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_small_dim_joins_broadcast(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["q5_local_supplier"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims are broadcast-sized


def test_latest_snapshot_single_shuffle_partial_agg(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["latest_snapshot"](spark, SF_SMALL))
    # map-side top-1-per-group (WindowGroupLimit Partial) BEFORE the
    # shuffle — the window equivalent of a partial aggregate; then
    # exactly the group-by-symbol exchange plus the output sort's
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange") <= 2


def test_minhash_signatures_no_shuffle(spark):
    """Signature computation must be a narrow map: the only Exchange
    allowed before the band join is the fan_out repartition."""
    docs = load_table(spark, SF_SMALL, "documents")
    toked = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", D.tokens("text").alias("toks")
    )
    toked = toked.filter(F.size("toks") >= 3)
    sh = toked.select("doc_id", D.shingles_from_tokens(F.col("toks")).alias("sh"))
    hashed = sh.select("doc_id", F.transform("sh", D._base_hash).alias("hs"))
    sig = hashed.select("doc_id", D.minhash_signature(F.col("hs")).alias("sig"))
    assert plan_of(sig).count("Exchange") <= 1


def test_brute_force_broadcasts_queries_not_corpus(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    plan = plan_of(S.brute_force_topk(emb, queries, k=3))
    assert "BroadcastExchange" in plan
    # the corpus-side scoring stage must not shuffle the corpus; the
    # only non-broadcast exchange is the window's partition-by-query
    assert plan.count("Exchange hashpartitioning") <= 1


def test_contamination_broadcasts_eval_not_train(spark):
    # the eval shingle set must be the broadcast build side; the
    # train corpus must never sort-merge (it would shuffle 100 TB)
    docs = load_table(spark, SF_SMALL, "documents")
    plan = plan_of(D.contamination_report(docs, docs.limit(50)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_chunks_no_global_single_partition_window(spark):
    # the corpus-sized window must be partitioned by the range
    # bucket; only the tiny bucket-totals window may be global
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        pack_chunks,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import token_count

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    plan = plan_of(pack_chunks(docs, "doc_id", "n_tokens", 512, bucket_size=100))
    # corpus window keyed by _b: its exchange hashes on _b
    assert "hashpartitioning(_b" in plan
    # offsets side is broadcast back, not joined by shuffle
    assert "BroadcastHashJoin" in plan


def test_ivf_query_reuses_built_index(spark):
    """The IVF probe path must reuse the cached centroid index (BUILD
    /QUERY split): a query given ivf_build output scans the cache, it
    does not re-run the posexplode+groupBy centroid subplan over the
    corpus (r2 verdict: that recompute-per-query was the bench
    regression and is the wrong plan at 100 TB)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = S.ivf_build(emb)
    try:
        plan = plan_of(S.ivf_topk(emb, queries, k=3, centroids=cents))
        assert "InMemoryTableScan" in plan
        # the live plan is generate-free: posexplode may only appear
        # inside the cached relation's recorded build plan
        assert "Generate posexplode" not in plan.split("InMemoryRelation")[0]
        # corpus side still broadcast-joins the probes, never shuffles
        assert "BroadcastHashJoin" in plan
    finally:
        cents.unpersist()


def test_fan_out_is_plan_based_not_rdd(spark):
    """fan_out must decide from the plan's input files: single-file
    scans get repartitioned to defaultParallelism, multi-file or
    non-file inputs pass through untouched (no df.rdd conversion)."""
    docs = load_table(spark, SF_SMALL, "documents")
    plan = plan_of(fan_out(docs))
    assert "Exchange RoundRobinPartitioning" in plan or "REPARTITION" in plan
    # in-memory frames are left alone
    mem = spark.range(10).toDF("x")
    assert plan_of(fan_out(mem)) == plan_of(mem)


def test_range_join_no_nested_loop(spark):
    # non-equi interval joins must run as bucket equi-joins with a
    # residual, never as a nested loop over the fact table
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_range_join"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_and_repetition_zero_shuffle(spark):
    """PII scrub and repetition scoring are pure Column expressions:
    the whole query must compile to a single map stage over the scan
    — any Exchange means someone broke whole-stage fusion."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        pii_counts,
        repetition_features,
        scrub_pii,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    scrubbed = docs.select(
        "doc_id",
        F.length(scrub_pii("text")).alias("slen"),
        *[c.alias(n) for n, c in pii_counts("text").items()],
    )
    assert "Exchange" not in plan_of(scrubbed)
    rep = docs.select(
        "doc_id",
        *[c.alias(n) for n, c in repetition_features("text").items()],
    )
    assert "Exchange" not in plan_of(rep)


def test_scalar_quantize_corpus_not_shuffled(spark):
    """The quantize pass must broadcast the 1-row codebook and scan
    the corpus once: no SortMergeJoin, no hash exchange of the corpus
    (the only exchanges allowed live in the tiny stats subplan)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    stats = S.scalar_quantize_stats(emb)
    plan = plan_of(S.scalar_quantize(emb, stats, dim=64))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row codebook, no key
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_kmeans_assignment_is_map_only(spark):
    """Lloyd assignment must be a broadcast fold over packed
    centroids — no per-vector argmin window (that would shuffle
    |corpus| x k scored rows), no sort-merge, no hash exchange of the
    corpus."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    plan = plan_of(S.kmeans_assign(emb, cents, dim=64))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_kmeans_iterate_plan_depth_bounded(spark):
    """Per-round centroid checkpoints must truncate lineage: the
    audit plan at iters=8 stays the size of the iters=2 plan instead
    of re-deriving every prior Lloyd round (quadratic plan growth —
    the CC-labels lesson, applied to centroids)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    p2 = len(plan_of(S.kmeans_iterate(emb, k=4, dim=64, iters=2)))
    p8 = len(plan_of(S.kmeans_iterate(emb, k=4, dim=64, iters=8)))
    assert p8 <= p2 * 1.2


def test_pq_encode_corpus_not_shuffled(spark):
    """PQ encode must broadcast the packed codebooks and scan the
    corpus once, zero-shuffle: no sort-merge, no hash exchange of the
    corpus (the only exchanges allowed live in the O(m*k) codebook
    packing subplan)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = S.pq_train(emb, m=4, k=4, dim=64, iters=1)
    plan = plan_of(S.pq_encode(emb, cents, m=4, dim=64))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row codebook payload
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_ivfadc_scores_only_probed_lists(spark):
    """IVFADC's scoring stage must be a broadcast EQUI-join of the
    code table against the probe-LUT side on the list label — the
    probed-list restriction is structural (only matching labels are
    scored), never a cross/nested-loop over all lists — and the
    corpus must not shuffle (the only BroadcastNestedLoopJoins are
    the 1-row codebook/centroid payload broadcasts)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = S.pq_train(emb, m=4, k=4, dim=64, iters=1)
    plan = plan_of(S.ivf_adc_topk(emb, queries, cents, m=4, dim=64, k=3, nprobe=2))
    assert "BroadcastHashJoin [label" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_gemm_audit_is_zero_join_map(spark):
    """The fold-vs-GEMM audit computes both paths in ONE map pipeline
    per family (keep_cols threading, not a corpus self-join): no
    sort-merge join, no hash exchange of the corpus on vec_id."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["emb_gemm_audit"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan


def test_salted_join_query_salts_the_shuffle(spark):
    """events_salted_join must actually execute the salted shape: a
    shuffled equi-join whose partitioning key includes __salt (the
    hot event_type keys spread over n_salts partitions), not a
    broadcast that would bypass the salt machinery."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_salted_join"](spark, SF_SMALL))
    assert "ShuffledHashJoin" in plan
    assert "__salt" in plan
    # the fact-side exchange hashes on (event_type, __salt)
    import re
    assert re.search(r"hashpartitioning\(event_type#\d+L?, __salt", plan)


def test_bucketed_join_query_zero_exchange_join(spark):
    """orders_bucketed_join's join must read co-located buckets with
    ZERO Exchange (the shuffle was paid at write time); the only
    hash exchange in the whole query is the final tiny per-status
    rollup."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["orders_bucketed_join"](spark, SF_SMALL))
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the rollup only
    assert "hashpartitioning(o_orderkey" not in plan


def test_semdedup_assignment_map_only_pairs_bucketed(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = emb.orderBy(F.col("vec_id").asc()).limit(4).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    plan = plan_of(S.semdedup(emb, cents, dim=64, threshold=0.3))
    # the pair stage must be a cid EQUI-join (hash or sort-merge on
    # the cid key, cosine + id inequality as residuals) — never an
    # unkeyed product over the corpus.  The only nested-loop node
    # allowed is kmeans_assign's designed 1-row centroid broadcast
    # (IdentityBroadcastMode).
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [cid" in plan or "SortMergeJoin [cid" in plan
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "IdentityBroadcastMode"
    )


def test_knn_classify_corpus_not_shuffled(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    plan = plan_of(S.knn_classify(corpus, queries, k=3))
    # scoring broadcasts the query set; the only hash exchanges are
    # the queries x k window/vote tails (never corpus-sized)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ema_macd_one_exchange_then_stream(spark):
    """EMA/MACD's plan is exactly ONE hash exchange on the key, an
    in-partition sort, and a single MapInPandas stream — never the
    per-group applyInPandas shape (FlatMapGroupsInPandas), whose
    per-group Arrow flush costs ~2s on 1,500 groups at sf0.1."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["prices_ema_macd"](spark, SF_SMALL))
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_rp_project_zero_shuffle_both_impls(spark):
    """Random projection is a pure map in either impl: no Exchange
    at all (the certified hof plan and the 100 TB codegen plan)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    for impl in ("hof", "codegen"):
        plan = plan_of(S.rp_project(emb, impl=impl))
        assert "Exchange" not in plan, impl


def test_zorder_code_zero_shuffle(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_zorder_code"](spark, SF_SMALL))
    assert "Exchange" not in plan


def test_hard_negatives_broadcasts_queries_not_corpus(spark):
    """Same contract as brute-force top-k: corpus scanned once,
    never shuffled; only the rank window's query-id exchange."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    plan = plan_of(S.hard_negative_topk(emb, queries, k=3))
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_triangles_no_cartesian_product(spark):
    """The wedge enumeration must stay an equi-join on src with a
    struct-comparison residual — a planner regression to a cartesian
    or broadcast-nested-loop join is the O(m^2) failure."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_triangles"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_confirm_needs_no_corpus_rejoin(spark):
    """Keys ride the postings: the ONLY scans are the two sides of
    the gram self-join — a Levenshtein confirm that re-joined the
    corpus (the naive formulation) would add two more."""
    docs = load_table(spark, SF_SMALL, "documents")
    keyed = docs.select(
        "doc_id", F.lower(F.substring("text", 1, 24)).alias("key")
    )
    plan = plan_of(D.fuzzy_key_pairs(keyed, max_doc_freq=50))
    assert plan.count("Scan parquet") == 2


def test_bollinger_and_stochastic_single_key_shuffle(spark):
    """Both overlay indicators must plan exactly one Exchange (the
    symbol-key sort that carries every window pass)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    for q in ("prices_bollinger", "prices_stochastic"):
        plan = plan_of(SPARK_QUERIES[q](spark, SF_SMALL))
        assert plan.count("Exchange") <= 2, q  # key shuffle (+AQE read)
        assert "CartesianProduct" not in plan, q


def test_pairwise_corr_topn_broadcast_no_cartesian(spark):
    """The top-N watchlist cut must reach the return table as a
    broadcast join, and the all-pairs stage must be the bucket-key
    equi-join — never a cartesian product."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["prices_corr_matrix"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_token_drift_aggs_are_map_side_combined(spark):
    """The (split, term) token agg must show partial aggregation
    before its Exchange — the map-side combine that keeps the token
    stream from shuffling raw."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["doc_token_drift"](spark, SF_SMALL))
    assert "partial_sum" in plan or "partial_count" in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast


def test_split_leakage_single_user_shuffle(spark):
    """Split tagging is a narrow map: the only Exchange is the
    user_id aggregate (plus the top-100 ordering)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_split_leakage"](spark, SF_SMALL))
    assert plan.count("Exchange") <= 2
    assert "partial_sum" in plan


def test_maxsim_tokens_broadcast_corpus_not_shuffled(spark):
    """MaxSim: the token table must broadcast onto the corpus scan —
    no sort-merge join, no cartesian against a non-broadcast side."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["emb_maxsim_topk"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cohort_ltv_single_custkey_shuffle(spark):
    """The min-year window and the revenue aggregate must share one
    custkey Exchange (plus the tiny output sort)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["orders_cohort_ltv"](spark, SF_SMALL))
    assert plan.count("Exchange") <= 3  # custkey + final agg + sort
    assert "CartesianProduct" not in plan


def test_recursion_folds_single_key_exchange(spark):
    """Heikin-Ashi and Holt: candles/series agg + ONE key repartition
    feeding the mapInPandas fold — no extra shuffles sneak in."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    for q in ("prices_heikin_ashi", "events_holt_forecast"):
        plan = plan_of(SPARK_QUERIES[q](spark, SF_SMALL))
        # candle/series agg exchange + key repartition (+AQE reads)
        assert plan.count("Exchange") <= 3, q
        assert "CartesianProduct" not in plan, q


def test_weighted_median_single_type_shuffle(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_weighted_median"](spark, SF_SMALL))
    # cumsum window, total window, and the argmin agg all share the
    # event_type partitioning
    assert plan.count("Exchange") <= 2
