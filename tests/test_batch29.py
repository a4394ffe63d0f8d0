"""Unit tests for the batch-29 operators: LSH precision/recall
audit, filtered vector search, repeat-purchase cadence, and
position-based attribution.  Query-level equivalence vs DuckDB is
the oracle harness's job (check_oracle-certified at sf0.01 and
sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_lsh_pr_audit_counts_are_consistent(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_lsh_pr_audit,
    )

    (r,) = q_doc_lsh_pr_audit(spark, SF_SMALL).collect()
    assert r["tp"] >= 0 and r["fp"] >= 0 and r["fn"] >= 0
    n_lsh = r["tp"] + r["fp"]
    n_truth = r["tp"] + r["fn"]
    if n_lsh:
        assert r["precision_ppm"] == r["tp"] * 1_000_000 // n_lsh
    if n_truth:
        assert r["recall_ppm"] == r["tp"] * 1_000_000 // n_truth


def test_filtered_topk_respects_the_predicate(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _FILTER_LABELS,
        q_emb_filtered_topk,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_emb_filtered_topk(spark, SF_SMALL).collect()
    assert rows
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in rows:
        assert labels[r["neighbor_id"]] in _FILTER_LABELS
        assert r["neighbor_id"] != r["query_id"]


def test_repeat_intervals_cover_repeat_customers(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_repeat_intervals,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_orders_repeat_intervals(spark, SF_SMALL).collect()
    assert rows
    total = sum(r["n_customers"] for r in rows)
    repeat = (
        load_table(spark, SF_SMALL, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .count()
    )
    assert total == repeat
    assert all(r["gap_weeks"] >= 0 for r in rows)


def test_position_attribution_credit_conserved(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    # user 1: view, click, view, purchase -> 3 touches (U-shape with
    # one middle: 400k + 200k + 400k); user 2: click, purchase -> 1
    # touch (full million); user 3: purchase only -> no touches
    df = spark.createDataFrame(
        [
            ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "view", 2),
            ev(4, 1, "purchase", 3),
            ev(5, 2, "click", 0), ev(6, 2, "purchase", 1),
            ev(7, 3, "purchase", 0),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    got = {
        r["event_type"]: r
        for r in B.q_events_position_attribution(spark, "x").collect()
    }
    # user 1: first view 400k, middle click 200k, last view 400k
    # user 2: single click 1,000,000
    assert got["view"]["credit_ppm"] == 800_000
    assert got["click"]["credit_ppm"] == 1_200_000
    # conservation: total = 1e6 per converting user WITH touches
    assert sum(r["credit_ppm"] for r in got.values()) == 2_000_000


def test_position_attribution_remainder_goes_to_last(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, typ, 1.0, "{}")

    # 5 touches -> 3 middles: 200000 // 3 = 66666 each, remainder 2
    # lands on the LAST touch (400000 + 2)
    df = spark.createDataFrame(
        [
            ev(1, "view", 0), ev(2, "click", 1), ev(3, "click", 2),
            ev(4, "click", 3), ev(5, "signup", 4), ev(6, "purchase", 5),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    got = {
        r["event_type"]: r["credit_ppm"]
        for r in B.q_events_position_attribution(spark, "x").collect()
    }
    assert got["view"] == 400_000
    assert got["click"] == 66_666 * 3
    assert got["signup"] == 400_000 + 2
    assert sum(got.values()) == 1_000_000
