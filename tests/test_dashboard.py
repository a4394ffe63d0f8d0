"""Dashboard aggregates (top-K+Other, ratio-of-total, distinct)."""

from __future__ import annotations

import pytest

from crypto_price_tracker_with_etl_dashboard_spark.operators import (
    display_snapshot,
    distinct_symbols,
    latest_snapshot,
    market_share,
    topk_with_other,
)


@pytest.fixture(scope="module")
def snapshot(prices_fixture):
    return latest_snapshot(prices_fixture, order_by_cap=False)


def test_null_and_zero_caps_excluded(snapshot):
    """frontend/src/App.js:94 keeps only market_cap > 0: doge (null)
    and zero (0.0) must not appear."""
    labels = [r["label"] for r in topk_with_other(snapshot, k=7).collect()]
    assert "DOGE" not in labels and "ZERO" not in labels


def test_topk_split_and_other_sum(snapshot):
    out = {r["label"]: r["market_cap"] for r in topk_with_other(snapshot, k=2).collect()}
    # eligible caps: btc 1110, eth 550, stale 90 -> top2 btc/eth, Other=90
    assert set(out) == {"BTC", "ETH", "Other"}
    assert out["Other"] == 90.0


def test_no_other_row_when_k_covers_all(snapshot):
    labels = [r["label"] for r in topk_with_other(snapshot, k=7).collect()]
    assert "Other" not in labels  # only 3 eligible symbols


def test_market_share_sums_to_100(snapshot):
    rows = market_share(snapshot, k=2).collect()
    assert abs(sum(r["pct"] for r in rows) - 100.0) < 0.05
    by_label = {r["label"]: r["pct"] for r in rows}
    assert by_label["BTC"] == pytest.approx(1110 / 1750 * 100, abs=0.01)


def test_distinct_symbols_sorted(prices_fixture):
    out = [r["symbol"] for r in distinct_symbols(prices_fixture).collect()]
    assert out == ["btc", "doge", "eth", "stale", "zero"]


def test_display_snapshot_formats_and_na(snapshot):
    """P10+P13 (frontend/src/App.js:545-552): toFixed(4) price with no
    grouping, toLocaleString-grouped caps, '$N/A' for null AND zero
    (JS truthiness), uppercase symbol."""
    out = {r["symbol"]: r for r in display_snapshot(snapshot).collect()}
    btc = out["BTC"]
    assert btc["price_display"] == "$111.0000"          # toFixed(4)
    assert btc["market_cap_display"] == "$1,110"        # grouped
    assert out["DOGE"]["market_cap_display"] == "$N/A"  # null -> N/A
    assert out["ZERO"]["market_cap_display"] == "$N/A"  # 0 is falsy in JS
    assert out["ZERO"]["price_display"] == "$2.2000"
    assert set(out) == {"BTC", "ETH", "DOGE", "ZERO", "STALE"}


def test_grouped_display_fraction_parity(spark):
    """toLocaleString() keeps up to 3 fraction digits (ECMA-402
    maximumFractionDigits default) — 56789.4 renders '$56,789.4', not
    the truncated '$56,789'; integers stay bare; the DuckDB twin
    produces identical strings."""
    import duckdb

    from crypto_price_tracker_with_etl_dashboard_spark.operators.dashboard import (
        _grouped_display,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.reference import (
        _sql_grouped,
    )

    vals = [56789.4, 1000.0, 0.125, 0.1256, 1234567.89, 12.3456]
    df = spark.createDataFrame([(v,) for v in vals], ["market_cap"])
    got = [r[0] for r in df.select(_grouped_display("market_cap")).collect()]
    want = ["$56,789.4", "$1,000", "$0.125", "$0.126", "$1,234,567.89", "$12.346"]
    assert got == want
    for v, g in zip(vals, got):
        (d,) = duckdb.sql(f"SELECT concat('$', {_sql_grouped(str(v))})").fetchone()
        assert d == g, (v, d, g)


def test_market_share_no_extra_denominator_scan(spark, snapshot):
    """The ratio-of-total denominator is a window sum over the
    segments, NOT a crossJoin against a separately re-derived total —
    the old formulation executed the whole snapshot pipeline twice
    more.  topk_with_other's own union (top-K branch + Other branch)
    legitimately reads the snapshot twice; the denominator must add
    ZERO further scans."""
    from tests.test_plans import plan_of

    plan = plan_of(market_share(snapshot, k=2))
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans <= 2, plan
