"""Smoke test for the worked training-data pipeline example: the
composition runs end to end at sf0.001 and each curation stage only
ever removes documents."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_training_data_pipeline_end_to_end(spark):
    from examples.training_data_pipeline import curate

    split, packed, stats = curate(spark, SF_SMALL)
    order = [
        "input", "after_quality_lang", "after_exact_dedup",
        "after_near_dedup", "after_decontaminate", "after_pps_sample",
    ]
    counts = [stats[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    assert stats["eval_items_to_drop"] >= 0
    assert sum(stats["split_sizes"].values()) == stats["after_pps_sample"]
    assert stats["train_chunks"] > 0
    # split column is total: every surviving row carries exactly one
    assert split.filter("split IS NULL").count() == 0


def test_vector_search_pipeline_end_to_end(spark):
    from examples.vector_search_pipeline import build_and_search

    reranked, negatives, projected, stats = build_and_search(spark, SF_SMALL)
    assert stats["final_pairs"] == stats["queries"] * 5
    assert stats["shortlist_pairs"] >= stats["final_pairs"]
    # deterministic pipeline on fixed data; 0.48 today — the loose
    # bound tolerates parameter tweaks, not a broken probe/re-rank
    assert stats["recall_at_k"] >= 0.3
    assert stats["hard_negatives"] == stats["queries"] * 5
    assert stats["projected_rows"] == stats["corpus"]
    # the refine contract: final ranking is exact — every returned
    # pair carries a rank 1..k and a finite distance
    rows = reranked.collect()
    assert all(1 <= r["rnk"] <= 5 and r["d2"] is not None for r in rows)


def test_market_analytics_pipeline_end_to_end(spark):
    from examples.market_analytics_pipeline import analyze

    stats = analyze(spark, SF_SMALL)
    # every indicator emits rows on the sf0.001 tick stream
    for k in ("vwap", "twap", "bollinger", "stochastic", "rsi", "ema_macd",
              "drawdown", "trend"):
        assert stats[k] > 0, k
    # the tick counts differ per indicator only through their warmup
    # frames: bollinger (20) emits fewer rows than stochastic (14+3)
    assert stats["bollinger"] <= stats["stochastic"] <= stats["twap"] * 1000
    assert len(stats["worst"]) == 3
    assert stats["corr_pairs"] <= 45  # C(10, 2)


def test_experimentation_pipeline_end_to_end(spark):
    from examples.experimentation_pipeline import run_experiment_analysis

    stats = run_experiment_analysis(spark, SF_SMALL)
    # row-level splits leak users by construction on this corpus
    assert stats["leaky_users"] > 0
    assert stats["n_a"] > 0 and stats["n_b"] > 0
    assert 0.0 <= stats["rate_a"] <= 1.0 and 0.0 <= stats["rate_b"] <= 1.0
    # CUPED internals: variance reduction is a squared correlation
    assert 0.0 <= stats["var_reduction"] <= 1.0
    # the CUPED correction is finite and the readout well-formed
    assert abs(stats["diff_adj"] - stats["diff_raw"]) < 1e6
    assert stats["theta"] == stats["theta"]  # not NaN
    assert stats["seasonality_cells"] > 0


def test_search_retrieval_pipeline_end_to_end(spark):
    from examples.search_retrieval_pipeline import run_retrieval_stack

    stats = run_retrieval_stack(spark, SF_SMALL)
    assert stats["bm25_pool"] > 0
    assert stats["cosine_pairs"] > 0
    assert stats["fused_topk"] == 10
    assert len(set(stats["fused_ids"])) == 10
    # both audits return well-formed verdicts; prefix serving is
    # expected to FAIL on untrained synthetic embeddings
    assert isinstance(stats["ann_recall_pass"], bool)
    assert 0 <= stats["matryoshka_recall_ppm"] <= 1_000_000
    assert len(stats["keyphrases"]) == 3


def test_risk_report_pipeline_end_to_end(spark):
    from examples.risk_report_pipeline import run_risk_report

    stats = run_risk_report(spark, SF_SMALL)
    assert len(stats["worst_var"]) == 5
    # VaR figures come from the loss tail
    assert all(v <= 0 for _, v in stats["worst_var"])
    assert len(stats["hottest_vol"]) == 5
    assert all(v > 0 for _, v in stats["hottest_vol"])
    assert len(stats["worst_drawdown"]) == 5
    assert all(0.0 <= d <= 1.0 for _, d in stats["worst_drawdown"])
    assert all(q >= 0 for _, q in stats["thinnest"])
    assert stats["n_symbols"] > 0
    # the dominant band histogram partitions the symbols
    assert sum(stats["dominant_band_histogram"].values()) == stats["n_symbols"]


def test_growth_analytics_pipeline_end_to_end(spark):
    from examples.growth_analytics_pipeline import run_growth_review

    out = run_growth_review(spark, SF_SMALL)
    assert 0 < out["median_dau_mau_ppm"] <= 1_000_000
    assert out["power_users_10d_plus"] >= 0
    assert out["cohort_rows"] > 0
    assert out["growth_weeks"] > 0
    assert out["top_entry_exit"] is not None
    assert 0 <= out["diagonal_session_share_ppm"] <= 1_000_000
    assert out["funnel_stages"] > 0
    assert 0 <= out["overall_abandon_ppm"] <= 1_000_000
