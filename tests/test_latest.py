"""Latest-per-symbol snapshot semantics (SURVEY.md section 2.3 J1 +
section 7.3 hard parts: tie handling, NULLS FIRST ordering, stale
symbols)."""

from __future__ import annotations

from crypto_price_tracker_with_etl_dashboard_spark.operators import latest_snapshot


def test_one_row_per_symbol(prices_fixture):
    out = latest_snapshot(prices_fixture).collect()
    symbols = [r["symbol"] for r in out]
    assert sorted(symbols) == ["btc", "doge", "eth", "stale", "zero"]


def test_tie_keeps_last_arrival(prices_fixture):
    """btc appears twice in the same batch (identical timestamp); the
    keep-last rule (frontend Map.set over arrival order) must pick the
    higher event_id row (price 111)."""
    out = {r["symbol"]: r for r in latest_snapshot(prices_fixture).collect()}
    assert out["btc"]["current_price"] == 111.0


def test_stale_symbol_retained(prices_fixture):
    """A symbol absent from the most recent batch keeps its older
    latest row — stale, not missing (FIXTURES.md section 1)."""
    out = {r["symbol"]: r for r in latest_snapshot(prices_fixture).collect()}
    assert out["stale"]["current_price"] == 9.0
    assert str(out["stale"]["timestamp"]).startswith("2024-01-10")


def test_nulls_first_ordering(prices_fixture):
    """PostgreSQL ORDER BY market_cap DESC places NULLs first
    (api/server.js:76); parity requires desc_nulls_first."""
    out = latest_snapshot(prices_fixture).collect()
    assert out[0]["market_cap"] is None  # doge leads
    caps = [r["market_cap"] for r in out[1:]]
    assert caps == sorted(caps, reverse=True)
