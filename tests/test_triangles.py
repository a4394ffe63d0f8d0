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


def test_estimator_emits_hub_rows_with_duckdb_parity(spark):
    """max_degree=3 + est_neighbor_cap=2 on a wheel: the hub (degree
    8) gets ONE estimate row built from its 2 md5-lowest neighbors'
    single sampled wedge, exact rows gain n_sampled_wedges=0, and the
    SQL twin reproduces every value bit-for-bit."""
    # wheel: hub 0 joined to rim 1..8, rim cycle closes 8 triangles
    edges = [(0, i) for i in range(1, 9)] + [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (1, 8),
    ]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: (
            r["degree"], r["triangles"], r["cc_ppm"], r["n_sampled_wedges"]
        )
        for r in triangle_counts(
            df, max_degree=3, est_neighbor_cap=2
        ).collect()
    }
    values = ", ".join(f"({u},{v})" for u, v in edges)
    want = {
        n: (d, t, c, w)
        for n, d, t, c, w in duckdb.sql(
            sql_triangle_counts(
                f"edges AS (SELECT * FROM (VALUES {values}) t(u, v))",
                max_degree=3,
                est_neighbor_cap=2,
            )
        ).fetchall()
    }
    assert got == want
    # the hub is present (estimate row), rim nodes are exact
    assert got[0][3] == 1  # C(2,2)=1 sampled wedge
    assert all(got[i][3] == 0 for i in range(1, 9))
    # hub estimate arithmetic: closed in {0,1}; triangles =
    # closed * ((8*7) div 2) = closed * 28, cc_ppm = closed * 1e6
    d, t, c, w = got[0]
    assert d == 8 and t in (0, 28) and c in (0, CC_SCALE)
    assert (t, c) in {(0, 0), (28, CC_SCALE)}


def test_estimator_dense_graph_nonempty(spark):
    """On K10 with max_degree=5 EVERY node is a hub: the pre-r9
    behavior returned 0 rows; the estimator returns one row per node
    with the exactly-right closure (a complete graph's sampled wedges
    are ALL closed, so cc_ppm = 1e6 and triangles = C(9,2) sampled
    through any 4-neighbor sample)."""
    k10 = [(a, b) for a in range(10) for b in range(10) if a < b]
    df = spark.createDataFrame(k10, ["u", "v"])
    rows = triangle_counts(df, max_degree=5, est_neighbor_cap=4).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["degree"] == 9
        assert r["n_sampled_wedges"] == 6  # C(4,2)
        assert r["cc_ppm"] == CC_SCALE
        assert r["triangles"] == 36  # 1 * ((9*8) div (2*6)) * 6 = 36 = C(9,2)


def test_estimator_requires_max_degree(spark):
    df = spark.createDataFrame([(0, 1)], ["u", "v"])
    with pytest.raises(ValueError):
        triangle_counts(df, est_neighbor_cap=4)
    with pytest.raises(ValueError):
        triangle_counts(df, max_degree=2, est_neighbor_cap=1)
    # max_degree = 0 would make a degree-1 node a zero-wedge "hub"
    # that the hubs-per_hub inner join silently drops, violating the
    # one-row-per-node contract (r9 ADVICE.md)
    with pytest.raises(ValueError, match="max_degree >= 1"):
        triangle_counts(df, max_degree=0, est_neighbor_cap=4)
