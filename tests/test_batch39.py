"""Unit tests for the batch-39 operators: SimHash bit-balance audit,
tick-coverage gap report, balance-activity correlation, image border
screen, and the monthly seasonal index.  Query-level equivalence vs
DuckDB is the oracle harness's job (check_oracle-certified at sf0.01
and sf0.1 this round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_simhash_bit_balance_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_simhash_bit_balance,
    )

    rows = q_doc_simhash_bit_balance(spark, SF_SMALL).collect()
    assert len(rows) == 32
    n = rows[0]["n_docs"]
    for r in rows:
        assert r["n_docs"] == n  # every bit sees the whole corpus
        assert 0 <= r["n_set"] <= n
        assert r["set_ppm"] == r["n_set"] * 1_000_000 // n
        assert r["skewed"] == (abs(2 * r["n_set"] - n) * 1_000_000 // n >= 500_000)


def test_gap_report_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_gap_report,
    )

    rows = q_prices_gap_report(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["span_days"] >= r["observed_days"] >= 1
        assert r["missing_days"] == r["span_days"] - r["observed_days"]
        assert 0 < r["coverage_ppm"] <= 1_000_000
        assert r["max_gap_days"] >= 0
        if r["missing_days"] == 0:
            assert r["max_gap_days"] == 0


def test_balance_activity_corr_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_customer_balance_activity_corr,
    )

    [r] = q_customer_balance_activity_corr(spark, SF_SMALL).collect()
    assert -1000 <= r["r_milli"] <= 1000
    assert r["n"] >= 2 and r["mean_orders_milli"] >= 0


def test_image_border_matches_closed_form(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_image_border,
    )

    rows = q_media_image_border(spark, SF_SMALL).limit(40).collect()
    assert rows
    for r in rows:
        mid = r["media_id"]
        k, w, h = mid % 251 + 1, mid % 13 + 4, mid % 7 + 4
        assert r["n_border"] == 2 * w + 2 * h - 4
        assert r["n_interior"] == w * h - r["n_border"]
        bs = sum(
            (2 * x + 3 * y + 3 * k) % 256
            for y in range(h)
            for x in range(w)
            if x in (0, w - 1) or y in (0, h - 1)
        )
        assert r["border_mean_milli"] == bs * 1000 // r["n_border"]
        assert (
            r["contrast_milli"]
            == r["border_mean_milli"] - r["interior_mean_milli"]
        )


def test_seasonal_index_sums_to_12(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_monthly_seasonal_index,
    )

    rows = q_orders_monthly_seasonal_index(spark, SF_SMALL).collect()
    assert [r["month"] for r in rows] == list(range(1, 13))
    total_index = sum(r["seasonal_index_ppm"] for r in rows)
    # floors lose < 12 ppm total
    assert 12_000_000 - 12 <= total_index <= 12_000_000
