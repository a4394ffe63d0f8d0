"""Unit tests for the batch-20 operators: Wilder ATR (the integer
RMA recursion, operators/indicators.py::atr) and multi-source BFS
(operators/bfs.py::multi_bfs_hops).  Query-level equivalence vs
DuckDB is the oracle harness's job (check_oracle-certified at sf0.01
and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from crypto_price_tracker_with_etl_dashboard_spark.operators.bfs import (
    bfs_hops,
    multi_bfs_hops,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import atr


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=5 * i)


def _candles(spark, rows):
    return spark.createDataFrame(
        [(s, _ts(i), h, lo, c) for (s, i, h, lo, c) in rows],
        "symbol string, window_start timestamp, high double, low double, close double",
    )


def test_atr_seed_and_wilder_recursion(spark):
    # n=2, SCALE-exact inputs: hand-derive the recursion (the
    # round-half-up lives at the FIXED-POINT digit, so unit-scale
    # halves like 3.5 are represented exactly, not rounded away)
    #   tr1 = h1-l1 = 4     atr1 = 4
    #   tr2 = max(h2-l2, |h2-c1|, |l2-c1|) = max(2, 3, 1) = 3
    #   atr2 = (4 + 3) / 2 = 3.5
    #   tr3 = max(1, |16-9|, |15-9|) = 7   atr3 = (3.5 + 7) / 2 = 5.25
    rows = [("btc", 0, 10.0, 6.0, 8.0), ("btc", 1, 11.0, 9.0, 9.0),
            ("btc", 2, 16.0, 15.0, 15.0)]
    out = {
        r["rn"]: (r["tr"], r["atr"])
        for r in atr(_candles(spark, rows), "symbol", "window_start", n=2).collect()
    }
    assert out[1] == (4.0, 4.0)
    assert out[2] == (3.0, 3.5)
    assert out[3] == (7.0, 5.25)


def test_atr_first_candle_ignores_missing_prev_close(spark):
    # first candle's TR is high-low even when |h-c0| would be larger
    rows = [("eth", 0, 100.0, 99.0, 99.5)]
    (r,) = atr(_candles(spark, rows), "symbol", "window_start", n=14).collect()
    assert r["tr"] == 1.0 and r["atr"] == 1.0 and r["rn"] == 1


def test_atr_keys_fold_independently(spark):
    # interleaved keys: each symbol's recursion must carry ITS OWN
    # prev_close across the partition-sorted run
    rows = [("a", 0, 10.0, 9.0, 9.0), ("b", 0, 50.0, 40.0, 45.0),
            ("a", 1, 9.5, 9.0, 9.2), ("b", 1, 46.0, 44.0, 44.0)]
    got = {
        (r["symbol"], r["rn"]): r["tr"]
        for r in atr(_candles(spark, rows), "symbol", "window_start", n=3).collect()
    }
    assert got[("a", 1)] == 1.0
    assert got[("a", 2)] == 0.5   # max(0.5, |9.5-9|, |9-9|)
    assert got[("b", 1)] == 10.0
    assert got[("b", 2)] == 2.0   # max(2, |46-45|, |44-45|)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_multi_bfs_matches_per_source_bfs(spark):
    # path 1-2-3-4 plus a branch 2-5 (undirected via mirrored edges)
    und = [(1, 2), (2, 3), (3, 4), (2, 5)]
    e = _edges(spark, und + [(b, a) for (a, b) in und])
    multi = {
        (r["root"], r["node"]): r["hops"]
        for r in multi_bfs_hops(e, sources=[1, 4], max_hops=3).collect()
    }
    for s in (1, 4):
        single = {
            r["node"]: r["hops"] for r in bfs_hops(e, source=s, max_hops=3).collect()
        }
        assert single == {n: h for (root, n), h in multi.items() if root == s}
    assert multi[(1, 4)] == 3 and multi[(4, 1)] == 3
    assert multi[(4, 5)] == 3  # via 3-2-5


def test_multi_bfs_roots_do_not_cross_contaminate(spark):
    # two disconnected components, one source in each: neither root
    # may reach the other's component
    und = [(1, 2), (10, 11)]
    e = _edges(spark, und + [(b, a) for (a, b) in und])
    got = {
        (r["root"], r["node"]): r["hops"]
        for r in multi_bfs_hops(e, sources=[1, 10], max_hops=4).collect()
    }
    assert got == {(1, 1): 0, (1, 2): 1, (10, 10): 0, (10, 11): 1}
