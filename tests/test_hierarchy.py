"""Forest resolution (operators/hierarchy.py): closed-form answers
on hand-built trees, deep-chain pointer doubling, DAG rejection,
cycle detection, and WITH RECURSIVE twin parity."""

from __future__ import annotations

import duckdb
import pytest

from crypto_price_tracker_with_etl_dashboard_spark.operators.hierarchy import (
    resolve_forest,
    sql_resolve_forest,
)


def _run(spark, rel, **kw):
    df = spark.createDataFrame(rel, ["child", "parent"])
    return {
        r["node"]: (r["root"], r["depth"])
        for r in resolve_forest(df, **kw).collect()
    }


def test_two_trees_roots_and_depths(spark):
    #      0           10
    #     / \           |
    #    1   2         11
    #        |
    #        3
    out = _run(spark, [(1, 0), (2, 0), (3, 2), (11, 10)])
    assert out == {
        0: (0, 0), 1: (0, 1), 2: (0, 1), 3: (0, 2), 10: (10, 0), 11: (10, 1)
    }


def test_deep_chain_resolves_in_log_rounds(spark):
    """A 100-deep chain needs ceil(log2(100)) = 7 doubling rounds —
    max_iterations=8 must suffice (a per-level walk would need 100)."""
    chain = [(i, i - 1) for i in range(1, 101)]
    out = _run(spark, chain, max_iterations=8)
    assert out[100] == (0, 100)
    assert out[1] == (0, 1)


def test_dag_rejected(spark):
    with pytest.raises(ValueError, match="DAG"):
        _run(spark, [(2, 0), (2, 1)])


def test_cycle_reported_not_looped(spark):
    with pytest.raises(ValueError, match="cycle"):
        _run(spark, [(1, 2), (2, 3), (3, 1)], max_iterations=6)


def test_duckdb_recursive_twin_parity(spark):
    rel = [(1, 0), (2, 0), (3, 1), (4, 3), (5, 3), (20, 19)]
    got = _run(spark, rel)
    values = ", ".join(f"({c},{p})" for c, p in rel)
    want = {
        n: (r, d)
        for n, r, d in duckdb.sql(
            sql_resolve_forest(
                f"parents AS (SELECT * FROM (VALUES {values}) t(child, parent))"
            )
        ).fetchall()
    }
    assert got == want
