"""Unit tests for the batch-28 operators: binary-tier recall audit,
Amihud illiquidity, per-segment Benford screen, and leaderboard
churn.  Query-level equivalence vs DuckDB is the oracle harness's
job (check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_binary_recall_is_exact_overlap(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_binary_recall,
        q_emb_binary_topk,
        q_emb_cosine_topk,
    )

    (r,) = q_emb_binary_recall(spark, SF_SMALL).collect()
    exact = {
        (x["query_id"], x["neighbor_id"])
        for x in q_emb_cosine_topk(spark, SF_SMALL).collect()
    }
    binq = {
        (x["query_id"], x["neighbor_id"])
        for x in q_emb_binary_topk(spark, SF_SMALL).collect()
    }
    assert r["n_pairs"] == len(exact)
    assert r["hits"] == len(exact & binq)
    assert r["overlap_ppm"] == r["hits"] * 1_000_000 // r["n_pairs"]


def test_amihud_ranks_thin_markets_first(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_amihud,
    )

    rows = q_prices_amihud(spark, SF_SMALL).collect()
    assert rows
    vals = [r["amihud_q"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(r["amihud_q"] >= 0 and r["n_ticks"] > 0 for r in rows)


def test_benford_by_segment_chi2_nonnegative(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        _BENFORD_SEG_FLAG_PPM,
        q_orders_benford_by_segment,
    )

    rows = q_orders_benford_by_segment(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["chi2_ppm"] >= 0
        assert r["flagged"] == (r["chi2_ppm"] >= _BENFORD_SEG_FLAG_PPM)
    assert len({r["segment"] for r in rows}) == len(rows)


def test_top_user_churn_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_top_user_churn,
    )

    rows = q_events_top_user_churn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap"] <= r["k"]
        assert r["churn_ppm"] == (r["k"] - r["overlap"]) * 1_000_000 // r["k"]
