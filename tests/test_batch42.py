"""Unit tests for the batch-42 operators: storage budget, trade-graph
growth, price realization, Ljung-Box test, and chars-per-token.
Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_storage_budget_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_storage_budget,
    )

    rows = q_emb_storage_budget(spark, SF_SMALL).collect()
    assert [r["tier"] for r in rows] == ["1-float32", "2-sq8", "3-pq", "4-binary"]
    n = rows[0]["n_vectors"]
    f32 = rows[0]["bytes_per_vec"]
    for r in rows:
        assert r["n_vectors"] == n
        assert r["total_bytes"] == n * r["bytes_per_vec"]
        assert r["compression_ppm"] == f32 * 1_000_000 // r["bytes_per_vec"]
    # every quantized tier compresses vs float32 (PQ at m=4 is even
    # smaller than the 8-byte binary signature — ordering by name,
    # not by size, is intentional)
    for r in rows[1:]:
        assert r["bytes_per_vec"] < f32


def test_graph_growth_monotone(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        q_trade_graph_growth,
    )

    rows = q_trade_graph_growth(spark, SF_SMALL).collect()
    assert rows
    cum = 0
    for r in rows:
        cum += r["new_edges"]
        assert r["cum_edges"] == cum
        assert r["suppliers_active"] <= r["new_edges"]
        assert r["customers_active"] <= r["new_edges"]


def test_price_realization_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_price_realization,
    )

    rows = q_parts_price_realization(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_parts"] >= 1
        # realized revenue is a sane multiple of list value
        assert 0 < r["realization_ppm"] < 100_000_000


def test_ljung_box_white_noise_vs_trend(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    # perfectly alternating returns: rho_1 ~ -1 -> Q explodes -> detect
    rows = []
    for i in range(30):
        close = 1000.0 if i % 2 == 0 else 1001.0
        rows.append(("btc", "Bitcoin", close, 1.0, 1.0, t0 + dt.timedelta(days=i), i))
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    [r] = FIN.q_prices_ljung_box(spark, "x").collect()
    assert r["autocorr_detected"]
    assert r["q_milli"] >= 7815


def test_ljung_box_real_data_sane(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_ljung_box,
    )

    rows = q_prices_ljung_box(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["q_milli"] >= 0  # Q is a sum of squares
        assert r["autocorr_detected"] == (r["q_milli"] >= 7815)


def test_chars_per_token_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_chars_per_token,
    )

    rows = q_doc_chars_per_token(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # a token plus its separator: ratio must exceed 1.0 and stay
        # word-sized for the synthetic corpus
        assert 1_000 < r["chars_per_token_milli"] < 20_000
        assert r["total_tokens"] >= r["n_docs"]
