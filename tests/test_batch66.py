"""Unit tests for batch 66: capped coreness decomposition
(events_core_number) and the dense-ring activity screen
(events_bot_ring_screen).  Oracle equivalence is check_oracle's job
(certified tri-SF this round); these pin hand-computed decomposition
semantics, nesting invariants, and plan shape."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.kcore import (
    core_decomposition,
    kcore,
)


@pytest.fixture()
def layered(spark):
    # K4 on {1,2,3,4} (3-core) + triangle {4,5,6} hanging off node 4
    # (2-core) + path 6-7-8 (1-core tail): coreness is hand-readable
    # per layer — 1,2,3,4 -> 3; 5,6 -> 2; 7,8 -> 1.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (4, 6), (5, 6),
        (6, 7), (7, 8),
    ]
    return spark.createDataFrame(edges, ["u", "v"])


def test_core_number_hand_computed(spark, layered):
    rows = {r.node: r.core for r in core_decomposition(layered, max_k=6).collect()}
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3, 5: 2, 6: 2, 7: 1, 8: 1}


def test_core_number_cap_binds(spark, layered):
    """max_k caps the report, not the graph: at max_k=2 the K4 nodes
    read 2 (they ARE in the 2-core) and the tails still read 1."""
    rows = {r.node: r.core for r in core_decomposition(layered, max_k=2).collect()}
    assert rows == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2, 7: 1, 8: 1}


def test_core_number_max_k_one_returns_all_nodes(spark, layered):
    rows = {r.node: r.core for r in core_decomposition(layered, max_k=1).collect()}
    assert rows == {n: 1 for n in range(1, 9)}


def test_core_number_consistent_with_kcore_membership(spark, layered):
    """core(v) >= k  <=>  v in kcore(k): the decomposition and the
    single-threshold operator must agree at every level."""
    cores = {r.node: r.core for r in core_decomposition(layered, max_k=4).collect()}
    for k in (2, 3, 4):
        members = {r.node for r in kcore(layered, k=k).collect()}
        assert members == {n for n, c in cores.items() if c >= k}, k


def test_core_number_validates_inputs(spark, layered):
    with pytest.raises(ValueError, match="max_k must be >= 1"):
        core_decomposition(layered, max_k=0)


def test_core_number_raises_when_unroll_too_shallow(spark):
    """A 6-node path needs 3 peel rounds at k=2 to fully unravel;
    rounds_per_level=1 must raise (the oracle-validity contract), not
    silently return a partial peel."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], ["u", "v"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        core_decomposition(path, max_k=2, rounds_per_level=1)


def test_bot_ring_screen_invariants(spark):
    """Screen rows carry core >= the threshold, positive activity,
    and exact integer intensity: epc_ppm = 1e6 * n_events / n_cells
    floored, with n_cells <= n_events always."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        _RING_MIN_CORE,
    )

    rows = SPARK_QUERIES["events_bot_ring_screen"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.core >= _RING_MIN_CORE
        assert 0 < r.n_cells <= r.n_events
        assert r.epc_ppm == (1_000_000 * r.n_events) // r.n_cells


def test_core_number_query_covers_every_graph_node(spark):
    """One row per co-occurrence-graph node, cores nested: the
    query's node set equals the certified kcore query's universe
    (every edge endpoint) and no core exceeds the cap."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        _CORE_MAX_K,
        _cooccur_edges,
    )

    rows = SPARK_QUERIES["events_core_number"](spark, SF_SMALL).collect()
    edges = _cooccur_edges(spark, SF_SMALL)
    nodes = {
        r.node
        for r in edges.select(
            F.explode(F.array("u", "v")).alias("node")
        ).distinct().collect()
    }
    assert {r.node for r in rows} == nodes
    assert all(1 <= r.core <= _CORE_MAX_K for r in rows)


def test_batch66_plans_no_cartesian_no_row_python(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    for name in ("events_core_number", "events_bot_ring_screen"):
        plan = (
            SPARK_QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
