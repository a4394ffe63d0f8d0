"""Unit tests for the batch-51 operators: Mann-Kendall, size
outliers, lead-time trend, new-user share, and AOV trend.
Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_mann_kendall_detects_monotone(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # strictly growing daily counts: S = n(n-1)/2, certain detection
    for d in range(12):
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(days=d), 1, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d_, n: df)
    [r] = B.q_events_mann_kendall(spark, "x").collect()
    assert r["S"] == 12 * 11 // 2
    assert r["direction"] == 1
    assert r["trend_detected"]


def test_mann_kendall_real_data_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_mann_kendall,
    )

    [r] = q_events_mann_kendall(spark, SF_SMALL).collect()
    max_s = r["n"] * (r["n"] - 1) // 2
    assert -max_s <= r["S"] <= max_s
    lhs = 18 * r["S"] ** 2 * 10000
    rhs = 38416 * r["n"] * (r["n"] - 1) * (2 * r["n"] + 5)
    assert r["trend_detected"] == (lhs >= rhs)


def test_size_outliers_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_size_outliers,
    )

    rows = q_media_size_outliers(spark, SF_SMALL).collect()
    assert {r["media_type"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert 0 <= r["oversized"] <= r["n_media"]
        assert r["oversized_ppm"] == r["oversized"] * 1_000_000 // r["n_media"]
        assert r["median_bytes"] >= 1


def test_lead_time_trend_sane(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        q_supply_lead_time_trend,
    )

    [r] = q_supply_lead_time_trend(spark, SF_SMALL).collect()
    assert r["n_quarters"] >= 3
    assert isinstance(r["slope_milli_days_per_q"], int)


def test_new_user_share_first_week_full(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_new_user_share,
    )

    rows = q_events_new_user_share(spark, SF_SMALL).collect()
    assert rows
    # the very first week is 100% new by definition
    assert rows[0]["new_share_ppm"] == 1_000_000
    for r in rows:
        assert 0 <= r["new_user_events"] <= r["n_events"]


def test_aov_trend_sane(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_aov_trend,
    )

    [r] = q_orders_aov_trend(spark, SF_SMALL).collect()
    assert r["n_quarters"] >= 3
    assert isinstance(r["slope_millicents_per_q"], int)
