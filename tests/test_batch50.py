"""Unit tests for the batch-50 operators: quarter-end loading, term
burstiness, invoice reconciliation, alert threshold sweep, and
golden/death crosses.  Query-level equivalence vs DuckDB is the
oracle harness's job (check_oracle-certified at sf0.01 and sf0.1
this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_quarter_end_loading_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_quarter_end_loading,
    )

    rows = q_orders_quarter_end_loading(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["last_week_orders"] <= r["n_orders"]
        lhs = (91 * r["last_week_orders"] - 7 * r["n_orders"]) ** 2 * 10000
        assert r["loading_detected"] == (lhs >= 22588608 * r["n_orders"])


def test_term_burstiness_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_term_burstiness,
    )

    rows = q_doc_term_burstiness(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    freqs = [r["s"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r["df"] >= 1 and r["s"] >= r["df"]
        assert r["vmr_milli"] >= 0


def test_reconciliation_reports(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_total_reconciliation,
    )

    [r] = q_orders_total_reconciliation(spark, SF_SMALL).collect()
    assert 0 <= r["mismatched"] <= r["n_orders"]
    assert r["mismatch_ppm"] == r["mismatched"] * 1_000_000 // r["n_orders"]
    assert r["max_delta_cents"] >= 0


def test_alert_sweep_monotone(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_alert_threshold_sweep,
    )

    rows = q_events_alert_threshold_sweep(spark, SF_SMALL).collect()
    assert [r["threshold"] for r in rows] == [5, 10, 20]
    alerts = [r["alert_cells"] for r in rows]
    assert alerts == sorted(alerts, reverse=True)
    for r in rows:
        assert 0 <= r["alert_cells"] <= r["n_cells"]


def test_golden_cross_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    # 25 flat days, then a jump up for 10 days, then a crash: the fast
    # mean crosses above once and below once after warm-up
    closes = [100.0] * 25 + [200.0] * 10 + [50.0] * 10
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
    [r] = FIN.q_prices_golden_cross(spark, "x").collect()
    assert r["golden_crosses"] == 1
    assert r["death_crosses"] == 1
