"""Unit tests for the batch-34 operators: nation trade balance,
supplier lead-time percentiles, experiment sizing, Laspeyres price
index, and drawdown spells.  Query-level equivalence vs DuckDB is the
oracle harness's job (check_oracle-certified at sf0.01 and sf0.1
this round)."""

from __future__ import annotations

import datetime as dt
import math

from conftest import SF_SMALL


def test_trade_balance_conservation(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        q_nation_trade_balance,
    )

    rows = q_nation_trade_balance(spark, SF_SMALL).collect()
    assert rows
    # every lineitem has exactly one supplier nation and one customer
    # nation, so global exports == global imports and balances net out
    assert abs(sum(r["exports"] for r in rows) - sum(r["imports"] for r in rows)) < 1e-6
    assert abs(sum(r["balance"] for r in rows)) < 1e-6
    for r in rows:
        assert abs(r["balance"] - (r["exports"] - r["imports"])) < 1e-9


def test_lead_time_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import tpch as TP

    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, 1, "O", 1.0, d0, "x") for i in range(1, 5)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    # leads 1, 2, 3, 4 days
    lineitem = spark.createDataFrame(
        [(i, 7, d0 + dt.timedelta(days=i)) for i in range(1, 5)],
        "l_orderkey bigint, l_suppkey bigint, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(7, 0)], "s_suppkey bigint, s_nationkey bigint"
    )
    nation = spark.createDataFrame([(0, "ALGERIA")], "n_nationkey bigint, n_name string")
    tables = {
        "orders": orders, "lineitem": lineitem,
        "supplier": supplier, "nation": nation,
    }
    monkeypatch.setattr(TP, "load_table", lambda s, d, n: tables[n])
    [r] = TP.q_supply_lead_time(spark, "x").collect()
    assert r["nation"] == "ALGERIA" and r["n_lines"] == 4
    assert r["med_days"] == 2  # lower median of {1,2,3,4}
    assert r["p90_days"] == 4  # ceil(0.9 * 4) = 4th order statistic


def test_mde_power_formula(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        _MDE_GRID_PPM,
        q_events_mde_power,
    )

    rows = {r["mde_rel_ppm"]: r for r in q_events_mde_power(spark, SF_SMALL).collect()}
    assert set(rows) == set(_MDE_GRID_PPM)
    z2 = (1.959964 + 0.841621) ** 2
    ns = []
    for mde_ppm, r in sorted(rows.items()):
        p = r["p_ppm"] / 1e6  # floored ppm ~ the exact p used inside
        mde = mde_ppm / 1e6
        approx = z2 * 2 * p * (1 - p) / (p * mde) ** 2
        # the ppm round-trip loses <1e-6 of p; allow 1% slack
        assert abs(r["n_per_arm"] - approx) <= max(2, 0.01 * approx)
        assert r["feasible"] == (r["n_per_arm"] * 2 <= r["n_users"])
        ns.append(r["n_per_arm"])
    assert ns == sorted(ns, reverse=True)  # bigger MDE -> fewer users
    assert math.isfinite(z2)


def test_price_index_base_year_is_unity(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_price_index,
    )

    rows = q_parts_price_index(spark, SF_SMALL).collect()
    assert rows
    base = min(rows, key=lambda r: r["yr"])
    assert base["index_ppm"] == 1_000_000  # basket valued at its own prices
    for r in rows:
        assert r["n_parts"] >= 1 and r["index_ppm"] > 0


def test_underwater_spells_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    closes = [10.0, 9.0, 9.5, 11.0, 10.0, 12.0]
    # runmax  10   10   10    11    11    12
    # uw       F    T    T     F     T     F  -> spells of len 2 and 1
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
    [r] = FIN.q_prices_underwater_spells(spark, "x").collect()
    assert r["n_spells"] == 2
    assert r["max_spell_days"] == 2
    assert r["underwater_days"] == 3


def test_underwater_spells_monotone_series_empty(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        ("btc", "Bitcoin", 100.0 + i, 1.0, 1.0, t0 + dt.timedelta(days=i), i)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    assert FIN.q_prices_underwater_spells(spark, "x").count() == 0
