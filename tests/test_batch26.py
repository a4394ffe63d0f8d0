"""Unit tests for the batch-26 operators: historical VaR, bounce
rate, sentence dedup, sequence violations, and dup-cluster stats.
Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_var_is_a_low_order_statistic(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_var_historical,
    )

    rows = q_prices_var_historical(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_returns"] > 0
        # the 5th-percentile return cannot exceed the median's side:
        # sanity — VaR is from the loss tail for any non-degenerate
        # series (allow 0 for flat series)
        assert r["var95_ppm"] <= 0 or r["n_returns"] < 20


def test_bounce_rate_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_bounce_rate,
    )

    rows = q_events_bounce_rate(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bounces"] <= r["n_sessions"]
        assert r["bounce_ppm"] == r["bounces"] * 1_000_000 // r["n_sessions"]


def test_sentence_dedup_flags_shared_sentences(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import text as TXT

    shared = "this exact sentence is repeated across both documents"
    df = spark.createDataFrame(
        [
            (1, f"{shared}. plus some unique first text here", "en", "s", 1),
            (2, f"{shared}! and different second content here", "en", "s", 1),
            (3, "entirely original third document content here", "en", "s", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(TXT, "load_table", lambda s, d, n: df)
    got = {r["doc_id"]: r for r in TXT.q_doc_sentence_dedup(spark, "x").collect()}
    assert got[1]["dup_sentences"] == 1 and got[1]["n_sentences"] == 2
    assert got[2]["dup_sentences"] == 1
    assert got[3]["dup_sentences"] == 0
    assert got[1]["dup_ppm"] == 500_000


def test_sequence_violations_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    df = spark.createDataFrame(
        [
            ev(1, 1, "signup", 0), ev(2, 1, "purchase", 5),   # legal
            ev(3, 2, "purchase", 0), ev(4, 2, "signup", 5),   # violation
            ev(5, 3, "purchase", 0),                          # no signup at all
            ev(6, 4, "view", 0),                              # no purchase
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    (r,) = B.q_events_sequence_violations(spark, "x").collect()
    assert r["n_users"] == 4
    assert r["violating_users"] == 2
    assert r["violation_ppm"] == 500_000


def test_dup_cluster_stats_matches_cluster_table(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dup_cluster_stats,
        q_doc_dup_clusters,
    )

    stats = q_doc_dup_cluster_stats(spark, SF_SMALL).collect()
    clusters = q_doc_dup_clusters(spark, SF_SMALL).collect()
    assert stats
    by_size: dict[int, int] = {}
    for c in clusters:
        by_size[c["n_docs"]] = by_size.get(c["n_docs"], 0) + 1
    got = {r["size"]: r["n_clusters"] for r in stats}
    assert got == by_size
    for r in stats:
        assert r["docs_in_clusters"] == r["size"] * r["n_clusters"]
        assert r["size"] >= 2  # a component needs at least one edge
