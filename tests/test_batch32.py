"""Unit tests for the batch-32 operators: growth accounting, Markov
stationary distribution, cluster separation, and the weekday effect.
Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_growth_accounting_identity(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_growth_accounting,
    )

    rows = q_events_growth_accounting(spark, SF_SMALL).collect()
    assert rows
    prev_actives = None
    for r in rows:
        # actives = new + retained + resurrected
        assert r["actives"] == r["new"] + r["retained"] + r["resurrected"]
        if prev_actives is not None:
            # churned = last week's actives who didn't retain
            assert r["churned"] == prev_actives - r["retained"]
        else:
            assert r["churned"] == 0
        prev_actives = r["actives"]
    assert rows[0]["new"] == rows[0]["actives"]  # first week: all new


def test_growth_accounting_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import (
        timeseries as TS,
    )

    w0 = dt.datetime(2024, 1, 1, 12)  # Monday
    rows = [
        # user 1 active weeks 0,1 (retained); user 2 weeks 0,2
        # (resurrected in w2); user 3 week 1 only (new in w1, churns)
        (1, w0, 1), (2, w0, 2),
        (3, w0 + dt.timedelta(days=7), 1), (4, w0 + dt.timedelta(days=7), 3),
        (5, w0 + dt.timedelta(days=14), 2),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "view", 1.0, "{}") for (eid, ts, uid) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(TS, "load_table", lambda s, d, n: df)
    got = {r["week"]: r for r in TS.q_events_growth_accounting(spark, "x").collect()}
    weeks = sorted(got)
    w1, w2, w3 = weeks
    assert (got[w1]["new"], got[w1]["retained"], got[w1]["resurrected"]) == (2, 0, 0)
    assert (got[w2]["new"], got[w2]["retained"], got[w2]["resurrected"]) == (1, 1, 0)
    assert got[w2]["churned"] == 1  # user 2 went quiet
    assert (got[w3]["new"], got[w3]["retained"], got[w3]["resurrected"]) == (0, 0, 1)
    assert got[w3]["churned"] == 2  # users 1 and 3


def test_markov_stationary_mass_is_conserved(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_markov_stationary,
    )

    rows = q_events_markov_stationary(spark, SF_SMALL).collect()
    assert rows
    total = sum(r["mass"] for r in rows)
    # row-stochastic chain: mass ~ 1e6 up to per-transition rounding
    assert abs(total - 1_000_000) < 1000
    assert all(r["mass"] >= 0 for r in rows)


def test_cluster_separation_positive(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_cluster_separation,
    )

    rows = q_emb_cluster_separation(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_vecs"] > 0
        assert r["intra_mean_d2"] > 0
        assert r["nearest_other_d2"] > 0
        assert r["separation_ppm"] == (
            r["nearest_other_d2"] * 1_000_000 // r["intra_mean_d2"]
        )


def test_weekday_effect_covers_the_week(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_weekday_effect,
    )

    rows = q_prices_weekday_effect(spark, SF_SMALL).collect()
    assert 1 <= len(rows) <= 7
    for r in rows:
        assert 1 <= r["weekday"] <= 7
        assert r["n_obs"] > 0
        assert -1_000_000 <= r["mean_ret_ppm"] <= 1_000_000
