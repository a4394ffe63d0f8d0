"""Unit tests for the batch-49 operators: mixed-language screen,
length profile, deseasonalized trend, k-anonymity audit, and exact
vector dups.  Query-level equivalence vs DuckDB is the oracle
harness's job (check_oracle-certified at sf0.01 and sf0.1 this
round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_mixed_lang_screen_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_mixed_lang_screen,
    )

    rows = q_doc_mixed_lang_screen(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["flagged"] <= r["n_docs"]
        assert r["flagged_ppm"] == r["flagged"] * 1_000_000 // r["n_docs"]


def test_length_profile_order(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_length_profile,
    )

    rows = q_doc_length_profile(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["min_chars"] <= r["median_chars"] <= r["max_chars"]
        assert r["n_docs"] >= 1


def test_deseasonalized_trend_sane(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_deseasonalized_trend,
    )

    [r] = q_orders_deseasonalized_trend(spark, SF_SMALL).collect()
    assert r["n"] >= 3
    assert isinstance(r["slope_milli_per_month"], int)


def test_k_anonymity_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_k_anonymity,
    )

    [r] = q_events_k_anonymity(spark, SF_SMALL).collect()
    assert r["n_quasi_ids"] <= r["n_users"]
    assert 0 <= r["unique_users"] <= r["n_quasi_ids"]
    assert r["unique_ppm"] == r["unique_users"] * 1_000_000 // r["n_users"]
    assert r["under_k5_ppm"] >= r["unique_ppm"]  # k=1 users are inside k<5


def test_exact_dups_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_exact_dups,
    )

    [r] = q_emb_exact_dups(spark, SF_SMALL).collect()
    assert r["n_unique"] <= r["n_vectors"]
    assert r["n_duplicates"] == r["n_vectors"] - r["n_unique"]
    assert r["dup_ppm"] == r["n_duplicates"] * 1_000_000 // r["n_vectors"]
    assert r["max_copies"] >= 1
