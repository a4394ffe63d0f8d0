"""Unit tests for the batch-43 operators: batch perceptron, higher
moments, PQ code balance, cross-language dup audit, and return-rate
league.  Query-level equivalence vs DuckDB is the oracle harness's
job (check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_perceptron_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # perfectly separable: buyers have many events, lurkers have one
    for uid in range(10):
        for _ in range(20):
            eid += 1
            rows.append((eid, t0, uid, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, t0, uid, "purchase", 1.0, "{}"))
    for uid in range(10, 30):
        eid += 1
        rows.append((eid, t0, uid, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    [r] = B.q_events_perceptron(spark, "x").collect()
    assert r["n_users"] == 30
    # separable data: the perceptron should fit it (3 rounds suffice
    # with these margins) and weights are exact ints by construction
    assert r["train_acc_ppm"] == 1_000_000
    for c in ("w0", "w1", "w2", "w3"):
        assert isinstance(r[c], int)


def test_perceptron_real_data_sane(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_perceptron,
    )

    [r] = q_events_perceptron(spark, SF_SMALL).collect()
    assert r["n_users"] > 0
    assert 0 <= r["train_acc_ppm"] <= 1_000_000


def test_higher_moments_symmetric_series(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    # alternating +-1 per-mille returns: perfectly symmetric ->
    # skew 0; two-point distribution -> excess kurtosis -2
    rows = []
    for i in range(25):
        close = 1000.0 if i % 2 == 0 else 1001.0
        rows.append(("btc", "Bitcoin", close, 1.0, 1.0, t0 + dt.timedelta(days=i), i))
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    [r] = FIN.q_prices_higher_moments(spark, "x").collect()
    assert r["skew_milli"] == 0
    assert r["ex_kurt_milli"] == -2000


def test_pq_code_balance_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_pq_code_balance,
    )

    rows = q_emb_pq_code_balance(spark, SF_SMALL).collect()
    assert rows
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], []).append(r)
    assert set(by_sub) == {0, 1, 2, 3}
    for sub, rs in by_sub.items():
        total = sum(r["n_vecs"] for r in rs)
        for r in rs:
            assert r["share_ppm"] == r["n_vecs"] * 1_000_000 // total
            assert r["codes_used"] == len(rs)


def test_cross_lang_dups_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_cross_lang_dups,
    )

    [r] = q_doc_cross_lang_dups(spark, SF_SMALL).collect()
    assert 0 <= r["cross_lang_pairs"] <= r["n_pairs"]
    if r["n_pairs"] > 0:
        assert (
            r["cross_lang_ppm"]
            == r["cross_lang_pairs"] * 1_000_000 // r["n_pairs"]
        )


def test_return_rates_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_return_rates,
    )

    rows = q_parts_return_rates(spark, SF_SMALL).collect()
    assert rows
    t_lines = sum(r["n_lines"] for r in rows)
    t_ret = sum(r["returned"] for r in rows)
    for r in rows:
        assert 0 <= r["returned"] <= r["n_lines"]
        assert r["return_ppm"] == r["returned"] * 1_000_000 // r["n_lines"]
        assert r["high_return"] == (
            r["returned"] * 2 * t_lines >= 3 * t_ret * r["n_lines"]
        )
