"""Unit tests for the batch-47 operators: edge retention, experiment
report, dedup savings, ANOVA decomposition, and aspect profile.
Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_edge_retention_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        q_trade_edge_retention,
    )

    rows = q_trade_edge_retention(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["retained_edges"] <= r["active_edges"]
        assert (
            r["retention_ppm"]
            == r["retained_edges"] * 1_000_000 // r["active_edges"]
        )


def test_experiment_report_composes_parts(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_experiment_report,
        q_events_srm_check,
        q_events_value_ab_welch,
    )

    [r] = q_events_experiment_report(spark, SF_SMALL).collect()
    [srm] = q_events_srm_check(spark, SF_SMALL).collect()
    [welch] = q_events_value_ab_welch(spark, SF_SMALL).collect()
    assert r["srm_detected"] == srm["srm_detected"]
    assert r["n_users"] == srm["n_users"]
    assert r["spend_t_milli"] == welch["t_milli"]
    assert r["readout_valid"] == (
        not r["srm_detected"] and not r["simpson_reversal"]
    )


def test_dedup_savings_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dedup_savings,
    )

    [r] = q_doc_dedup_savings(spark, SF_SMALL).collect()
    assert 0 <= r["docs_removed"] < r["n_docs"]
    assert 0 <= r["chars_removed"] <= r["total_chars"]
    assert r["savings_ppm"] == r["chars_removed"] * 1_000_000 // r["total_chars"]


def test_anova_eta2_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_variance_anova,
    )

    [r] = q_events_variance_anova(spark, SF_SMALL).collect()
    assert r["k"] >= 1 and r["n"] >= r["k"]
    assert 0 <= r["eta2_ppm"] <= 1_000_000


def test_aspect_profile_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_aspect_profile,
    )

    rows = q_media_aspect_profile(spark, SF_SMALL).collect()
    assert rows
    total = sum(r["n"] for r in rows)
    for r in rows:
        # synth dims: w in 4..16, h in 4..10 -> milli ratio bounded
        assert 400 <= r["aspect_milli"] <= 4000
        assert r["share_ppm"] == r["n"] * 1_000_000 // total
        assert r["extreme"] == (
            r["aspect_milli"] > 2000 or r["aspect_milli"] < 500
        )
