"""Degree-oriented triangle counting (operators/triangles.py):
closed-form answers on hand-built graphs, DuckDB parity on an
arbitrary toy graph, and the 3T global invariant."""

from __future__ import annotations

import duckdb
import pytest

from crypto_price_tracker_with_etl_dashboard_spark.operators.triangles import (
    CC_SCALE,
    sql_triangle_counts,
    triangle_counts,
)


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, ["u", "v"])
    return {
        r["node"]: (r["degree"], r["triangles"], r["cc_ppm"])
        for r in triangle_counts(df).collect()
    }


def test_k4_every_node_fully_clustered(spark):
    """K4: every node has degree 3, sits in 3 triangles, cc = 1."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = _run(spark, k4)
    assert out == {n: (3, 3, CC_SCALE) for n in range(4)}


def test_triangle_with_pendant(spark):
    """Triangle 0-1-2 plus pendant edge 2-3: the pendant node has no
    triangles and degree 1 (cc defined as 0); node 2's cc halves."""
    out = _run(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    assert out[0] == (2, 1, CC_SCALE)
    assert out[1] == (2, 1, CC_SCALE)
    assert out[2] == (3, 1, CC_SCALE // 3)  # 2*1/(3*2) = 1/3
    assert out[3] == (1, 0, 0)


def test_triangle_free_graph_all_zero(spark):
    """C4 (square) has no triangles; every cc is 0."""
    out = _run(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    assert all(v == (2, 0, 0) for v in out.values())


def test_global_invariant_and_duckdb_parity(spark):
    """Per-node counts sum to 3*T, and the whole output matches the
    SQL twin on a graph with skewed degrees (hub node 0)."""
    edges = (
        [(0, i) for i in range(1, 8)]          # hub star
        + [(1, 2), (3, 4), (5, 6), (2, 3)]     # some closures
        + [(8, 9)]                              # detached edge
    )
    got = _run(spark, edges)
    values = ", ".join(f"({u},{v})" for u, v in edges)
    want = {
        n: (d, t, c)
        for n, d, t, c in duckdb.sql(
            sql_triangle_counts(f"edges AS (SELECT * FROM (VALUES {values}) t(u, v))")
        ).fetchall()
    }
    assert got == want
    total = sum(t for _, t, _ in got.values())
    assert total % 3 == 0 and total == 3 * 4  # 4 triangles via the hub


def test_max_degree_excludes_hub_and_its_triangles(spark):
    """With max_degree=2 the degree-7 hub of a wheel-ish graph is
    dropped: its triangles vanish, remaining nodes keep only the
    rim edges, and the reported degree is the FULL-graph degree.
    The SQL twin applies the identical cap."""
    edges = [(0, i) for i in range(1, 8)] + [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = {
        r["node"]: (r["degree"], r["triangles"])
        for r in triangle_counts(df, max_degree=2).collect()
    }
    # hub 0 (deg 7) and nodes 2 (deg 3) are gone; the rim edges
    # (1,2),(2,3) lose their capped endpoint so no triangles remain
    assert 0 not in out and 2 not in out
    assert out[1] == (2, 0)
    values = ", ".join(f"({u},{v})" for u, v in edges)
    want = {
        n: (d, t)
        for n, d, t, _ in duckdb.sql(
            sql_triangle_counts(
                f"edges AS (SELECT * FROM (VALUES {values}) t(u, v))", max_degree=2
            )
        ).fetchall()
    }
    assert {n: v[:2] for n, v in out.items()} == want


def test_rejects_nothing_but_counts_empty_graph(spark):
    """An empty edge list yields an empty result, not an error."""
    df = spark.createDataFrame([], "u long, v long")
    assert triangle_counts(df).count() == 0
