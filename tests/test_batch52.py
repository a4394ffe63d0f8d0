"""Unit tests for the batch-52 operators: variance break,
preferential attachment, debt cohort, activity streaks, and lead
variability.  Query-level equivalence vs DuckDB is the oracle
harness's job (check_oracle-certified at sf0.01 and sf0.1 this
round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_variance_break_detects_shift(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    closes = []
    # calm first half (+-1 per-mille), wild second half (+-50)
    for i in range(15):
        closes.append(1000.0 if i % 2 == 0 else 1001.0)
    for i in range(15):
        closes.append(1000.0 if i % 2 == 0 else 1050.0)
    rows = [
        ("btc", "Bitcoin", c, 1.0, 1.0, t0 + dt.timedelta(days=i), i)
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    [r] = FIN.q_prices_variance_break(spark, "x").collect()
    assert r["f_ratio_milli"] > 2000
    assert r["regime_shift"]


def test_preferential_attachment_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        q_trade_preferential_attachment,
    )

    rows = q_trade_preferential_attachment(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_gainers"] >= 1
        assert r["gainer_mean_deg_milli"] >= 1000  # prior degree >= 1
        assert r["attachment_ratio_ppm"] > 0


def test_debt_cohort_partition(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_customer_debt_cohort,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_customer_debt_cohort(spark, SF_SMALL).collect()
    n_total = load_table(spark, SF_SMALL, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_total
    for r in rows:
        assert r["orders_per_cust_milli"] >= 0
        assert r["cents_per_cust"] >= 0


def test_activity_streaks_partition(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_activity_streaks,
    )

    rows = q_events_activity_streaks(spark, SF_SMALL).collect()
    assert rows
    assert abs(sum(r["share_ppm"] for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        assert 1 <= r["streak_days"] <= 7


def test_lead_variability_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        q_supplier_lead_variability,
    )

    rows = q_supplier_lead_variability(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    iqrs = [r["iqr_days"] for r in rows]
    assert iqrs == sorted(iqrs, reverse=True)
    for r in rows:
        assert r["p25"] <= r["p75"]
        assert r["iqr_days"] == r["p75"] - r["p25"]
