"""Unit tests for the batch-35 operators: peak concurrent sessions,
momentum quintiles, Kelly sizing, HLL overlap audit, and the supplier
scorecard.  Query-level equivalence vs DuckDB is the oracle harness's
job (check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_peak_concurrency_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    d = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: one session 10:00 - 10:10
        (1, d + dt.timedelta(hours=10), 1),
        (2, d + dt.timedelta(hours=10, minutes=10), 1),
        # user 2: single-event session at 10:05 (inside user 1's)
        (3, d + dt.timedelta(hours=10, minutes=5), 2),
        # user 3: isolated single-event session at 23:00
        (4, d + dt.timedelta(hours=23), 3),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "view", 1.0, "{}") for (eid, ts, uid) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d_, n: df)
    [r] = B.q_events_peak_concurrency(spark, "x").collect()
    assert r["sessions_started"] == 3
    assert r["peak_concurrency"] == 2  # users 1 and 2 overlap at 10:05


def test_peak_concurrency_never_negative(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_peak_concurrency,
    )

    rows = q_events_peak_concurrency(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["peak_concurrency"] >= 1
        assert r["sessions_started"] >= 0


def test_momentum_quintiles_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        _MOM_QUANTILES,
        q_prices_momentum_deciles,
    )

    rows = q_prices_momentum_deciles(spark, SF_SMALL).collect()
    assert [r["quintile"] for r in rows] == list(range(1, _MOM_QUANTILES + 1))
    sizes = [r["n_symbols"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    for r in rows:
        assert -1_000_000 <= r["mean_fwd_ppm"] <= 1_000_000


def test_kelly_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = []
    for i in range(25):  # alternating +-1000 ppm returns -> S = 0
        close = 1000.0 if i % 2 == 0 else 1001.0
        rows.append(("btc", "Bitcoin", close, 1.0, 1.0, t0 + dt.timedelta(days=i), i))
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    [r] = FIN.q_prices_kelly(spark, "x").collect()
    assert r["n"] == 24
    assert r["mean_ret_ppm"] == 0
    assert r["kelly_ppm"] == 0  # zero edge -> zero allocation


def test_kelly_clip(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        _KELLY_CLIP_PPM,
        q_prices_kelly,
    )

    rows = q_prices_kelly(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -_KELLY_CLIP_PPM <= r["kelly_ppm"] <= _KELLY_CLIP_PPM


def test_hll_overlap_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_events_hll_overlap,
    )

    [r] = q_events_hll_overlap(spark, SF_SMALL).collect()
    assert r["est_overlap"] == r["est_a"] + r["est_b"] - r["est_union"]
    assert r["est_a"] > 0 and r["est_b"] > 0
    assert r["est_union"] <= r["est_a"] + r["est_b"]
    assert r["exact_overlap"] >= 0
    # 64-register HLL on sf0.001's tiny overlap is coarse; pin the
    # error's arithmetic identity (truncating div like Spark's `div`)
    num = (r["est_overlap"] - r["exact_overlap"]) * 1_000_000
    assert r["err_ppm"] == int(num / r["exact_overlap"])


def test_supplier_scorecard_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        _SCORECARD_TOPN,
        q_supplier_scorecard,
    )

    rows = q_supplier_scorecard(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= _SCORECARD_TOPN
    revs = [r["revenue_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert sum(r["rev_share_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert 0 <= r["on_time_ppm"] <= 1_000_000
        assert r["n_lines"] >= 1
