"""Semantic + plan-shape tests for the as-of join operator
(operators/asof.py): inclusive at-or-before match, no-prior-quote
nulls, and the single-shuffle plan that makes it viable at scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.asof import asof_join
from tests.conftest import ts


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:00"), 10.0),
            (1, ts("2024-01-01T00:10:00"), 11.0),
            (1, ts("2024-01-01T01:00:00"), 12.0),
            (2, ts("2024-01-01T00:30:00"), 99.0),
        ],
        "user_id long, ts timestamp, quote_price double",
    )
    trades = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01T00:05:00")),   # between quotes -> 10.0
            (1, 101, ts("2024-01-01T00:10:00")),   # equal ts -> inclusive 11.0
            (1, 102, ts("2024-01-01T02:00:00")),   # after all -> 12.0
            (2, 200, ts("2024-01-01T00:00:00")),   # before any quote -> null
            (3, 300, ts("2024-01-01T00:00:00")),   # key with no quotes -> null
        ],
        "user_id long, trade_id long, ts timestamp",
    )
    return trades, quotes


def test_asof_join_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on="user_id", ts="ts",
        right_value_cols=["quote_price"], right_ts_alias="quote_ts",
    )
    got = {r["trade_id"]: (r["quote_price"], r["quote_ts"]) for r in out.collect()}
    assert got[100] == (10.0, ts("2024-01-01T00:00:00"))
    assert got[101] == (11.0, ts("2024-01-01T00:10:00"))  # inclusive bound
    assert got[102] == (12.0, ts("2024-01-01T01:00:00"))
    assert got[200] == (None, None)
    assert got[300] == (None, None)
    assert out.count() == trades.count()  # left join: every trade kept


def test_asof_join_single_shuffle(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on="user_id", ts="ts",
        right_value_cols=["quote_price"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key for the window; unions are not
    # exchanges — the naive range-join alternative would show a
    # cartesian/range join here instead.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_left_preserves_unmatched(spark):
    """how='left' must keep points outside every interval (the
    residual is part of the join condition, not a post-filter that
    would NULL-drop them)."""
    import pytest

    from crypto_price_tracker_with_etl_dashboard_spark.operators.range_join import (
        bucketed_range_join,
    )

    points = spark.createDataFrame(
        [(1, ts("2024-01-01T00:30:00")), (2, ts("2024-01-05T00:00:00"))],
        "point_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, ts("2024-01-01T00:00:00"), ts("2024-01-01T01:00:00"))],
        "iv_id long, start timestamp, end timestamp",
    )
    got = {
        r["point_id"]: r["iv_id"]
        for r in bucketed_range_join(
            points, intervals, "ts", "start", "end", how="left"
        ).collect()
    }
    assert got == {1: 10, 2: None}

    with pytest.raises(ValueError, match="unsupported"):
        bucketed_range_join(points, intervals, "ts", "start", "end", how="full")
