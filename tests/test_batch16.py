"""Unit + plan tests for the batch-16 operators: Bellman-Ford
relaxation (operators/bfs.py::bellman_ford) and the plan shapes of
the winsorization / KS queries.  Query-level equivalence vs DuckDB
is the oracle harness's job."""

from __future__ import annotations

from crypto_price_tracker_with_etl_dashboard_spark.operators.bfs import (
    bellman_ford,
    bfs_hops,
)


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src bigint, dst bigint, w bigint")


def test_bellman_ford_longer_path_can_be_cheaper(spark):
    # 1->2 direct costs 10; 1->3->2 costs 2: the weighted answer
    # (and exactly why BFS's visited-set pruning is unsound here)
    e = _wedges(spark, [(1, 2, 10), (1, 3, 1), (3, 2, 1)])
    out = {r["node"]: r["cost"] for r in bellman_ford(e, 1, 3).collect()}
    assert out == {1: 0, 2: 2, 3: 1}


def test_bellman_ford_partial_rounds_are_deterministic(spark):
    # after ONE round only direct edges are relaxed — the certified
    # contract is "the k-round table", not "converged distances"
    e = _wedges(spark, [(1, 2, 10), (1, 3, 1), (3, 2, 1)])
    one = {r["node"]: r["cost"] for r in bellman_ford(e, 1, 1).collect()}
    assert one == {1: 0, 2: 10, 3: 1}


def test_bellman_ford_unit_weights_match_bfs(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5)]
    e = _wedges(spark, [(s, d, 1) for s, d in pairs])
    hops = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            spark.createDataFrame(pairs, "src bigint, dst bigint"), 1, 4
        ).collect()
    }
    cost = {r["node"]: r["cost"] for r in bellman_ford(e, 1, 4).collect()}
    assert hops == cost


def test_bellman_ford_negative_rounds_rejected(spark):
    import pytest

    e = _wedges(spark, [(1, 2, 1)])
    with pytest.raises(ValueError):
        bellman_ford(e, 1, 0)


def test_winsorize_no_corpus_window_without_partition(spark):
    from tests.conftest import SF_SMALL
    from tests.test_plans import plan_of
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_winsorize"](spark, SF_SMALL))
    # cut table broadcasts back: the only repartitioning is on the
    # group key (rank window + two aggregates)
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_ks_split_grid_is_aggregated_before_window(spark):
    from tests.conftest import SF_SMALL
    from tests.test_plans import plan_of
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["events_ks_split"](spark, SF_SMALL))
    # the cumulative window must run AFTER the per-bin aggregate
    # (grid rows, value-range bounded), so exactly one hash exchange
    # touches corpus-sized data
    assert plan.count("Exchange hashpartitioning") <= 1
