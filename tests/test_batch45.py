"""Unit tests for the batch-45 operators: dedup idempotence audit,
dormancy histogram, price dispersion, Neyman allocation, and
spread-volume correlation.  Query-level equivalence vs DuckDB is the
oracle harness's job (check_oracle-certified at sf0.01 and sf0.1
this round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_dedup_idempotence_holds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dedup_idempotence,
    )

    [r] = q_doc_dedup_idempotence(spark, SF_SMALL).collect()
    assert r["n_after_1"] <= r["n_docs"]
    assert r["n_after_2"] == r["n_after_1"]
    assert r["idempotent"]


def test_dormancy_histogram_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_dormancy_histogram,
    )

    rows = q_events_dormancy_histogram(spark, SF_SMALL).collect()
    if not rows:  # sf0.001 may have no quiet days at all
        return
    total = sum(r["n"] for r in rows)
    for r in rows:
        assert 1 <= r["dormancy_days"] <= 5
        assert r["share_ppm"] == r["n"] * 1_000_000 // total


def test_price_dispersion_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_price_dispersion,
    )

    [r] = q_parts_price_dispersion(spark, SF_SMALL).collect()
    assert 0 <= r["dispersed"] <= r["n_part_months"]
    assert r["dispersed_ppm"] == r["dispersed"] * 1_000_000 // r["n_part_months"]
    assert r["max_dispersion_ppm"] >= 0


def test_neyman_allocation_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_neyman_allocation,
    )

    rows = q_events_neyman_allocation(spark, SF_SMALL).collect()
    assert rows
    # floored allocations never exceed the budget, and lose < 1 per
    # stratum to flooring
    total = sum(r["alloc_n"] for r in rows)
    assert 10_000 - len(rows) <= total <= 10_000
    assert sum(r["alloc_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["alloc_n"] >= 0


def test_spread_volume_corr_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_spread_volume_corr,
    )

    [r] = q_prices_spread_volume_corr(spark, SF_SMALL).collect()
    assert r["n"] >= 3
    assert -1000 <= r["r_milli"] <= 1000
