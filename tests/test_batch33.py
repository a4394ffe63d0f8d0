"""Unit tests for the batch-33 operators: behavioral diversity,
join-key skew report, Zipf rank-frequency check, monthly revenue
recognition, and the Lo-MacKinlay variance ratio.  Query-level
equivalence vs DuckDB is the oracle harness's job (check_oracle-
certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_user_diversity_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_user_diversity,
    )

    rows = q_events_user_diversity(spark, SF_SMALL).collect()
    assert rows
    prev_n = None
    for r in rows:
        # inverse-Simpson effective types lie in [1, n_types]
        assert 1_000_000 <= r["eff_types_ppm"] <= r["n_types"] * 1_000_000
        assert r["n_types"] <= r["n_events"]
        if prev_n is not None:  # TakeOrdered by volume desc
            assert r["n_events"] <= prev_n
        prev_n = r["n_events"]


def test_user_diversity_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: 4 events evenly over 2 types -> eff = 2.0
    for et in ["view", "view", "click", "click"]:
        eid += 1
        rows.append((eid, t0, 1, et, 1.0, "{}"))
    # user 2: 3 events all one type -> eff = 1.0
    for et in ["view"] * 3:
        eid += 1
        rows.append((eid, t0, 2, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    got = {r["user_id"]: r for r in B.q_events_user_diversity(spark, "x").collect()}
    assert got[1]["eff_types_ppm"] == 2_000_000  # 4^2 / (2^2 + 2^2)
    assert got[2]["eff_types_ppm"] == 1_000_000  # 3^2 / 3^2
    assert got[1]["n_types"] == 2 and got[2]["n_types"] == 1


def test_key_skew_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_key_skew,
    )

    [r] = q_events_key_skew(spark, SF_SMALL).collect()
    assert r["n_keys"] >= 1 and r["n_rows"] >= r["n_keys"]
    assert r["max_rows"] >= r["mean_rows"] >= 1
    assert r["mean_rows"] == r["n_rows"] // r["n_keys"]
    # max/mean >= 1 by definition; top10 share is a valid ppm
    assert r["skew_ratio_ppm"] >= 1_000_000 - r["n_keys"]  # floor slack
    assert 0 < r["top10_share_ppm"] <= 1_000_000
    assert r["salting_advised"] == (r["skew_ratio_ppm"] >= 10_000_000)


def test_zipf_check_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_zipf_check,
    )

    rows = q_doc_zipf_check(spark, SF_SMALL).collect()
    assert rows
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in by_rank]
    assert freqs == sorted(freqs, reverse=True)  # rank follows frequency
    for r in by_rank:
        assert r["rank_freq"] == r["rank"] * r["freq"]
        assert 0 < r["share_ppm"] <= 1_000_000
    assert sum(r["share_ppm"] for r in by_rank) <= 1_000_000


def test_revenue_recognition_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import olap as O

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, dt.datetime(2024, 1, 15), "1-URGENT"),
            (2, 11, "O", 50.0, dt.datetime(2024, 2, 1), "2-HIGH"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 2, 20)),
            (1, dt.datetime(2024, 3, 2)),
            (2, dt.datetime(2024, 2, 10)),
        ],
        "l_orderkey bigint, l_shipdate timestamp",
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(O, "load_table", lambda s, d, n: tables[n])
    got = {
        str(r["month"]): r
        for r in O.q_orders_revenue_recognition(spark, "x").collect()
    }
    # order 1: 10000 cents over Jan..Mar -> 3334 + 3333 + 3333
    # order 2: 5000 cents in Feb only
    assert got["2024-01-01"]["recognized_cents"] == 3334
    assert got["2024-02-01"]["recognized_cents"] == 3333 + 5000
    assert got["2024-03-01"]["recognized_cents"] == 3333
    assert got["2024-01-01"]["orders_active"] == 1
    assert got["2024-02-01"]["orders_active"] == 2
    # proration is exact: schedule sums to the cents total
    total = sum(r["recognized_cents"] for r in got.values())
    assert total == 10000 + 5000


def test_revenue_recognition_conserves_cents(spark):
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_revenue_recognition,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    out = q_orders_revenue_recognition(spark, SF_SMALL)
    recognized = out.agg(F.sum("recognized_cents")).collect()[0][0]
    expected = (
        load_table(spark, SF_SMALL, "orders")
        .join(
            load_table(spark, SF_SMALL, "lineitem").select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert recognized == expected


def test_variance_ratio_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    # alternating closes 1000 <-> 1001 give EXACT +1000/-1000 ppm
    # returns (floor((1000-1001)*1e6/1001) == -1000); 25 days -> 24
    # returns.  q=2 blocks all sum to 0 -> VR(2) = 0; q=5 block sums
    # alternate +-1000 -> VR(5) = (4*4e6 * 24 * 24) / (5 * 24*24e6
    # * 4 * 4) = 0.2 exactly.
    t0 = dt.datetime(2024, 1, 1, 12)
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
    got = {r["q"]: r for r in FIN.q_prices_variance_ratio(spark, "x").collect()}
    assert got[2]["n1"] == 24 and got[2]["nq"] == 12
    assert got[2]["vr"] == 0.0
    assert got[5]["nq"] == 4
    assert abs(got[5]["vr"] - 0.2) < 1e-12


def test_variance_ratio_constant_series_filtered(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        ("btc", "Bitcoin", 1000.0, 1.0, 1.0, t0 + dt.timedelta(days=i), i)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    # zero daily variance -> the var1 > 0 guard drops the symbol
    assert FIN.q_prices_variance_ratio(spark, "x").count() == 0
