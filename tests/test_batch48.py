"""Unit tests for the batch-48 operators: one-time parts, effective
dimensionality, Markov fan-out, first-vs-repeat orders, and source
vocabulary overlap.  Query-level equivalence vs DuckDB is the oracle
harness's job (check_oracle-certified at sf0.01 and sf0.1 this
round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_one_time_share_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_one_time_share,
    )

    [r] = q_parts_one_time_share(spark, SF_SMALL).collect()
    assert 0 <= r["one_time_parts"] <= r["n_parts"]
    assert 0 <= r["one_time_part_ppm"] <= 1_000_000
    assert 0 <= r["one_time_rev_ppm"] <= 1_000_000


def test_effective_dim_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_effective_dim,
    )

    [r] = q_emb_effective_dim(spark, SF_SMALL).collect()
    # PR lies in [1, d]
    assert 1_000 <= r["effective_dim_milli"] <= r["d"] * 1_000
    assert 0 <= r["isotropy_ppm"] <= 1_000_000


def test_markov_fanout_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_markov_fanout,
    )

    rows = q_events_markov_fanout(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # inverse-Simpson lies in [1, n_successors]
        assert 1_000_000 <= r["eff_successors_ppm"] <= r["n_successors"] * 1_000_000
        assert r["n_successors"] <= 5  # five event types


def test_first_vs_repeat_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_first_vs_repeat,
    )

    [r] = q_orders_first_vs_repeat(spark, SF_SMALL).collect()
    assert r["n_first"] > 0 and r["n_repeat"] > 0
    assert (
        r["repeat_vs_first_ppm"]
        == r["mean_repeat_cents"] * 1_000_000 // r["mean_first_cents"]
    )


def test_vocab_overlap_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_source_vocab_overlap,
    )

    rows = q_doc_source_vocab_overlap(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 1 <= r["shared"] <= 100
        assert r["jaccard_ppm"] == r["shared"] * 1_000_000 // (200 - r["shared"])
