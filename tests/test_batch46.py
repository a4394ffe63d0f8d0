"""Unit tests for the batch-46 operators: post-stratified lift,
rich-club density, hapax share, norm audit, and streaks.  Query-level
equivalence vs DuckDB is the oracle harness's job (check_oracle-
certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt
import math

from conftest import SF_SMALL


def test_poststrat_lift_present(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_poststrat_lift,
    )

    rows = q_events_poststrat_lift(spark, SF_SMALL).collect()
    # sf0.001's 15 users may leave a stratum-arm cell empty; when the
    # row exists, both lifts are valid ppm deltas
    for r in rows:
        assert -1_000_000 <= r["raw_lift_ppm"] <= 1_000_000
        assert -1_000_000 <= r["adjusted_lift_ppm"] <= 1_000_000


def test_rich_club_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        q_trade_rich_club,
    )

    rows = q_trade_rich_club(spark, SF_SMALL).collect()
    assert [r["k"] for r in rows] == [10, 20, 50]
    prev_ns = math.inf
    for r in rows:
        assert r["n_s"] <= prev_ns  # clubs shrink as k rises
        prev_ns = r["n_s"]
        assert 0 <= r["realized"] <= r["n_s"] * r["n_c"]
        if r["n_s"] * r["n_c"] > 0:
            assert (
                r["density_ppm"]
                == r["realized"] * 1_000_000 // (r["n_s"] * r["n_c"])
            )


def test_hapax_share_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_hapax_share,
    )

    rows = q_doc_hapax_share(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hapax"] <= r["vocab_size"]
        assert r["hapax_ppm"] == r["hapax"] * 1_000_000 // r["vocab_size"]


def test_norm_audit_order_statistics(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_norm_audit,
    )

    [r] = q_emb_norm_audit(spark, SF_SMALL).collect()
    assert r["min_norm_milli"] <= r["median_norm_milli"] <= r["max_norm_milli"]
    assert 0 <= r["unit_norm_ppm"] <= 1_000_000
    assert r["n_vectors"] > 0


def test_streaks_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    # closes: up, up, up, down, flat, down -> max up 3, max down 1
    # (the flat day breaks the down run)
    closes = [10.0, 11.0, 12.0, 13.0, 12.0, 12.0, 11.0]
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
    [r] = FIN.q_prices_streaks(spark, "x").collect()
    assert r["max_up_streak"] == 3
    assert r["max_down_streak"] == 1
