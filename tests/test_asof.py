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


def test_asof_null_value_rows_returned_verbatim(spark):
    """The matched right row travels atomically: a NULL value column
    on the latest quote must come back as NULL (DuckDB/pandas ASOF
    semantics), not get back-filled from an OLDER quote — the
    per-column last(ignorenulls) formulation fabricated rows that
    never existed."""
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:10"), 100.0),
            (1, ts("2024-01-01T00:00:20"), None),
        ],
        "k long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, 7, ts("2024-01-01T00:00:30"))], "k long, tid long, ts timestamp"
    )
    (row,) = asof_join(trades, quotes, "k", "ts", ["px"]).collect()
    assert row["right_ts"] == ts("2024-01-01T00:00:20")
    assert row["px"] is None


def test_asof_rejects_colliding_left_columns(spark):
    import pytest

    trades, quotes = _frames(spark)
    bad = trades.withColumn("quote_price", F.lit(1.0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(bad, quotes, "user_id", "ts", ["quote_price"])


def test_range_join_subsecond_interval_end(spark):
    """unix_timestamp() floors sub-second ends: an interval ending at
    10:00:00.500 must still replicate into the 10:00:00 bucket, or
    events in (10:00:00, 10:00:00.500) silently vanish from an inner
    join."""
    import datetime as dt

    from crypto_price_tracker_with_etl_dashboard_spark.operators.range_join import (
        bucketed_range_join,
    )

    end = dt.datetime(2024, 1, 1, 10, 0, 0, 500_000)
    ev = dt.datetime(2024, 1, 1, 10, 0, 0, 250_000)
    points = spark.createDataFrame([(1, ev)], "point_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [(10, ts("2024-01-01T09:00:00"), end)],
        "iv_id long, start timestamp, end timestamp",
    )
    got = bucketed_range_join(points, intervals, "ts", "start", "end").collect()
    assert len(got) == 1 and got[0]["iv_id"] == 10
    # and an integer-second end stays exclusive of its boundary bucket
    pts2 = spark.createDataFrame(
        [(2, ts("2024-01-01T10:00:00"))], "point_id long, ts timestamp"
    )
    iv2 = spark.createDataFrame(
        [(11, ts("2024-01-01T09:00:00"), ts("2024-01-01T10:00:00"))],
        "iv_id long, start timestamp, end timestamp",
    )
    assert bucketed_range_join(pts2, iv2, "ts", "start", "end").count() == 0


def test_range_join_rejects_degenerate_bucket(spark):
    import pytest

    from crypto_price_tracker_with_etl_dashboard_spark.operators.range_join import (
        bucketed_range_join,
    )

    points = spark.createDataFrame([(1, ts("2024-01-01T00:30:00"))], "point_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [(10, ts("2024-01-01T00:00:00"), ts("2024-01-01T01:00:00"))],
        "iv_id long, start timestamp, end timestamp",
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        bucketed_range_join(points, intervals, "ts", "start", "end", bucket_seconds=0)
