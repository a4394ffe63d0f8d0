"""Temporal operators (operators/temporal.py): change-point
compression semantics on planted runs, SCD2 interval chaining."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.temporal import (
    change_points,
    validity_intervals,
)


def ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h)


def make_log(spark):
    rows = [
        # symbol, price, ts, event_id — 'a' has a flat run, 'b' a null run
        ("a", 1.0, ts(0), 1),
        ("a", 1.0, ts(1), 2),   # unchanged -> dropped
        ("a", 2.0, ts(2), 3),
        ("a", 2.0, ts(3), 4),   # unchanged -> dropped
        ("a", 1.0, ts(4), 5),   # back to old value -> KEPT (change)
        ("b", None, ts(0), 6),
        ("b", None, ts(1), 7),  # null == null (null-safe) -> dropped
        ("b", 3.0, ts(2), 8),
    ]
    return spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])


def test_change_points_compresses_runs(spark):
    log = make_log(spark)
    kept = change_points(log, "symbol", ["t", "event_id"], "price")
    assert sorted(r["event_id"] for r in kept.collect()) == [1, 3, 5, 6, 8]


def test_change_points_idempotent(spark):
    log = make_log(spark)
    once = change_points(log, "symbol", ["t", "event_id"], "price")
    twice = change_points(once, "symbol", ["t", "event_id"], "price")
    assert sorted(r["event_id"] for r in twice.collect()) == sorted(
        r["event_id"] for r in once.collect()
    )


def test_validity_intervals_chain(spark):
    log = make_log(spark)
    iv = validity_intervals(log, "symbol", "t", ["t", "event_id"]).orderBy(
        "symbol", "event_id"
    )
    a = [r for r in iv.collect() if r["symbol"] == "a"]
    # intervals chain: each valid_to == next valid_from; last is open
    for prev, nxt in zip(a, a[1:]):
        assert prev["valid_to"] == nxt["valid_from"]
    assert a[-1]["valid_to"] is None
    # every row keeps its own observation time as valid_from
    assert all(r["valid_from"] == r["t"] for r in a)


def test_point_in_time_lookup_via_intervals(spark):
    # the SCD2 output answers "price of 'a' as of 03:30" correctly
    log = make_log(spark)
    iv = validity_intervals(log, "symbol", "t", ["t", "event_id"])
    asof = dt.datetime(2024, 1, 1, 3, 30)
    hit = iv.filter(
        (F.col("symbol") == "a")
        & (F.col("valid_from") <= F.lit(asof))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(asof)))
    ).collect()
    assert len(hit) == 1 and hit[0]["event_id"] == 4
