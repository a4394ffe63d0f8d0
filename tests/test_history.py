"""History-slice bound semantics (SURVEY.md section 2.2 P6-P8): the
end bound is EXCLUSIVE start-of-next-day, so end-date 23:59:59.999
rows are kept and next-day 00:00:00.000 rows are dropped."""

from __future__ import annotations

from crypto_price_tracker_with_etl_dashboard_spark.operators import history_slice


def test_end_date_inclusive_to_millisecond(prices_fixture):
    out = history_slice(prices_fixture, "btc", "2024-01-10", "2024-01-11").collect()
    prices = [r["current_price"] for r in out]
    assert 101.0 in prices  # 2024-01-11T23:59:59.999 kept
    assert 102.0 not in prices  # 2024-01-12T00:00:00.000 excluded


def test_start_inclusive(prices_fixture):
    out = history_slice(prices_fixture, "btc", "2024-01-12", None).collect()
    prices = [r["current_price"] for r in out]
    assert 102.0 in prices  # exactly at start midnight
    assert 101.0 not in prices


def test_symbol_lookup_lowercased(prices_fixture):
    """api/server.js:102 lowercases the symbol param."""
    out = history_slice(prices_fixture, "BTC", None, None).collect()
    assert len(out) == 5


def test_chronological_order(prices_fixture):
    out = history_slice(prices_fixture, "btc", None, None).collect()
    stamps = [r["timestamp"] for r in out]
    assert stamps == sorted(stamps)


def test_history_rejects_malformed_dates(prices_fixture):
    """A malformed bound must raise, not cast to NULL and silently
    return an empty history (non-ANSI cast semantics)."""
    import pytest

    with pytest.raises(ValueError, match="start_date"):
        history_slice(prices_fixture, "btc", start_date="05/01/2024")
    with pytest.raises(ValueError, match="end_date"):
        history_slice(prices_fixture, "btc", end_date="not-a-date")
