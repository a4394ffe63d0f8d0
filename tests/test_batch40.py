"""Unit tests for the batch-40 operators: correlation clusters,
lineitem domain audit, dedup length bias, session fatigue curve, and
round-number clustering.  Query-level equivalence vs DuckDB is the
oracle harness's job (check_oracle-certified at sf0.01 and sf0.1
this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL


def test_corr_clusters_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_corr_clusters,
    )

    rows = q_prices_corr_clusters(spark, SF_SMALL).collect()
    assert rows
    # communities are node labels -> every community id is a member id
    nodes = {int(r["symbol"][1:]) for r in rows}
    for r in rows:
        assert r["symbol"].startswith("c")
        assert r["community"] in nodes or r["community"] >= 0


def test_domain_audit_finds_real_breach(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_lineitem_domain_audit,
    )

    [r] = q_lineitem_domain_audit(spark, SF_SMALL).collect()
    assert r["n_rows"] > 0
    # the synthetic generator honors the value domains...
    assert r["bad_quantity"] == r["bad_discount"] == r["bad_tax"] == 0
    assert r["nonpositive_price"] == 0
    # ...but NOT the temporal rule: shipdate is drawn independently of
    # orderdate, so the audit catches a real contract breach — exactly
    # the kind of generator bug this gate exists to surface
    assert r["ship_before_order"] > 0
    assert not r["contract_clean"]


def test_domain_audit_catches_violations(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import olap as O

    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.0, d0, "x")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            # bad quantity (0), bad discount (0.5), ship before order
            (1, 1, 1, 1, 0.0, 5.0, 0.5, 0.01, "N", "O", d0 - dt.timedelta(days=1)),
            (1, 1, 1, 2, 2.0, 5.0, 0.01, 0.01, "N", "O", d0),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    tables = {"orders": orders, "lineitem": lineitem}
    monkeypatch.setattr(O, "load_table", lambda s, d, n: tables[n])
    [r] = O.q_lineitem_domain_audit(spark, "x").collect()
    assert r["bad_quantity"] == 1
    assert r["bad_discount"] == 1
    assert r["ship_before_order"] == 1
    assert not r["contract_clean"]


def test_dup_length_bias_row_always_present(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dup_length_bias,
    )

    [r] = q_doc_dup_length_bias(spark, SF_SMALL).collect()
    assert r["n_docs"] > 0
    if r["dup_docs"] == 0:
        assert r["mean_len_dup_milli"] is None
        assert r["dup_len_ratio_ppm"] is None
    else:
        assert r["dup_len_ratio_ppm"] is not None


def test_session_fatigue_positions(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_session_fatigue,
    )

    rows = q_events_session_fatigue(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 2 <= r["position"] <= 20  # position 1 has no prior gap
        assert r["n_steps"] >= 1
        assert 0 <= r["mean_gap_milli_s"] <= 1800 * 1000  # inside the gap bound


def test_round_clustering_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_round_clustering,
    )

    [r] = q_prices_round_clustering(spark, SF_SMALL).collect()
    assert 0 <= r["round_ticks"] <= r["n_ticks"]
    assert r["round_ppm"] == r["round_ticks"] * 1_000_000 // r["n_ticks"]
    lhs = (100 * r["round_ticks"] - r["n_ticks"]) ** 2 * 10000
    assert r["clustering_detected"] == (lhs >= 3803184 * r["n_ticks"])
