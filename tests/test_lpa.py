"""Synchronous label propagation (operators/lpa.py): community
recovery on planted structure, min-label tie semantics, DuckDB
parity on an arbitrary toy graph, fixed-round determinism."""

from __future__ import annotations

import duckdb
import pytest

from crypto_price_tracker_with_etl_dashboard_spark.operators.lpa import (
    label_propagation,
    sql_label_propagation,
)


def _run(spark, edge_list, iters=3):
    df = spark.createDataFrame(edge_list, ["u", "v"])
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_two_cliques_with_bridge_recovered(spark):
    """Two K4s joined by one bridge edge: each clique converges to
    its own minimum label (min-tie rule pulls toward node ids 0/10)."""
    edges = _clique([0, 1, 2, 3]) + _clique([10, 11, 12, 13]) + [(3, 10)]
    out = _run(spark, edges, iters=4)
    assert {out[n] for n in (0, 1, 2, 3)} == {0}
    assert {out[n] for n in (10, 11, 12, 13)} == {10}


def test_min_label_tie_on_star(spark):
    """Star center's neighbors all carry distinct labels (count 1
    each) after round 1 -> tie breaks to the SMALLEST label."""
    edges = [(0, i) for i in range(1, 5)]
    out = _run(spark, edges, iters=1)
    assert out[0] == 1  # leaves 1..4 tie at one vote each -> min
    assert all(out[i] == 0 for i in range(1, 5))  # leaves see only 0


def test_duckdb_parity_and_determinism(spark):
    edges = (
        _clique([0, 1, 2]) + _clique([5, 6, 7, 8]) + [(2, 5), (8, 20), (20, 21)]
    )
    got = _run(spark, edges, iters=3)
    values = ", ".join(f"({u},{v})" for u, v in edges)
    want = dict(
        duckdb.sql(
            sql_label_propagation(
                f"edges AS (SELECT * FROM (VALUES {values}) t(u, v))", iters=3
            )
        ).fetchall()
    )
    assert got == want
    assert got == _run(spark, edges, iters=3)  # stable across runs


def test_rejects_zero_iters(spark):
    df = spark.createDataFrame([(1, 2)], ["u", "v"])
    with pytest.raises(ValueError, match="iters"):
        label_propagation(df, iters=0)
