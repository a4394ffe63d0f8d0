"""Unit tests for the batch-55 operators: event-type co-occurrence
lift, weekly user-concentration HHI, and the order-priority mix-drift
audit — plus the overflow-safety regression for the widened lift
arithmetic (r6 advice #2).  Oracle equivalence is check_oracle's job;
these pin shapes and invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_type_cooccurrence_invariants(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_type_cooccurrence,
    )

    rows = q_events_type_cooccurrence(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # canonical unordered pair
        assert r["co_baskets"] >= 1
        assert r["lift_ppm"] > 0


def test_cooccurrence_lift_arithmetic_survives_big_counts(spark):
    """The r6 lift expression (co * n_total * 1e6 as BIGINT) wrapped
    silently once co * n_total exceeded ~9.2e12; the widened
    DECIMAL(38,0) form must stay exact at basket counts a 100 TB
    corpus actually reaches (r6 advice #2)."""
    [r] = spark.sql(
        """SELECT
        (CAST(co AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * 1000000)
          div (CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0)))
          AS lift_ppm
        FROM VALUES (3000000000, 4000000000, 3000000000, 4000000000)
          AS t(co, n, na, nb)"""
    ).collect()
    # co == na and n == nb -> lift is exactly 1e6 (independence);
    # the intermediate product is 1.2e25, far past BIGINT
    assert r["lift_ppm"] == 1_000_000


def test_user_hhi_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_user_hhi_weekly,
    )

    rows = q_events_user_hhi_weekly(spark, SF_SMALL).collect()
    assert rows
    weeks = [r["week"] for r in rows]
    assert weeks == sorted(weeks)
    for r in rows:
        assert r["n_events"] >= r["n_users"] >= 1
        # HHI of n equal users is 1e6/n; concentration only raises it
        assert 1_000_000 // r["n_users"] <= r["hhi_ppm"] <= 1_000_000
        # effective users in [1, n_users]
        assert 1000 <= r["eff_users_milli"] <= r["n_users"] * 1000


def test_priority_mix_drift_shares_and_flag(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        _PMIX_FLAG_PPM,
        q_orders_priority_mix_drift,
    )

    rows = q_orders_priority_mix_drift(spark, SF_SMALL).collect()
    assert rows
    by_year: dict = {}
    for r in rows:
        by_year.setdefault(r["year"], []).append(r)
        assert r["flagged"] == (abs(r["drift_ppm"]) >= _PMIX_FLAG_PPM)
    for year_rows in by_year.values():
        total = sum(r["share_ppm"] for r in year_rows)
        # integer-floored shares: within len(rows) ppm below 1e6
        assert 1_000_000 - len(year_rows) <= total <= 1_000_000
