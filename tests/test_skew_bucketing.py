"""Scale-technique tests: salted aggregation/join correctness (vs the
unsalted plan) and the shuffle-free bucketed join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_SMALL, "events")
    plain = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        [("value", "count", "n"), ("value", "min", "lo"), ("value", "max", "hi")],
        n_salts=8,
    )
    cols = ["event_type", "n", "lo", "hi"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_agg_two_stage_plan(spark):
    ev = load_table(spark, SF_SMALL, "events")
    salted = salted_agg(ev, ["event_type"], [("value", "count", "n")], n_salts=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # one exchange on (key, salt), one on key — the hot key spreads
    # over 8 partitions in the first
    assert plan.count("Exchange hashpartitioning") == 2


def test_salted_join_matches_plain(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    users = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    plain = ev.join(users, "user_id")
    salted = salted_join(ev, users, on="user_id", n_salts=4)
    cols = ["event_id", "user_id", "value", "n_events"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/bktest'")
    try:
        orders = load_table(spark, SF_SMALL, "orders")
        li = load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "bktest.orders_b", "o_orderkey", 4)
        write_bucketed(li, "bktest.lineitem_b", "o_orderkey", 4)
        joined = bucketed_join(spark, "bktest.orders_b", "bktest.lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-location paid at write time
        # and it actually runs
        assert joined.count() == orders.join(li, "o_orderkey").count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_salted_join_rejects_build_preserving_outer(spark):
    """Replicated build rows would each null-pad once: a right/full
    outer join through the salt construction duplicates unmatched
    build rows n_salts times, so those join types are refused."""
    import pytest

    ev = load_table(spark, SF_SMALL, "events").limit(10)
    dim = ev.select("event_type").distinct()
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="skewed-side-preserving"):
            salted_join(ev, dim, "event_type", how=how)


def test_salted_agg_spreads_identical_rows(spark):
    """The classic skew shape — one hot key of IDENTICAL rows.  A
    whole-row-hash salt would put them all in one sub-group (one
    reducer, no mitigation); the row-position salt must use >1."""
    df = spark.createDataFrame([("hot", 1.0)] * 2000, ["k", "v"]).repartition(8)
    from crypto_price_tracker_with_etl_dashboard_spark.operators.skew import _salt

    n_sub = (
        df.select("k", _salt(16).alias("s")).groupBy("k", "s").count().count()
    )
    assert n_sub > 1
    # and the merged result is still exact
    out = salted_agg(df, ["k"], [("v", "sum", "total"), ("v", "count", "n")])
    r = out.collect()[0]
    assert (r["total"], r["n"]) == (2000.0, 2000)


def test_salted_ops_tolerate_map_columns(spark):
    """F.hash rejects MapType: salting must not hash unrelated
    columns, or any table carrying a map column crashes."""
    df = spark.createDataFrame(
        [("a", 1.0, {"m": "x"}), ("a", 2.0, {"m": "y"})],
        "k string, v double, meta map<string,string>",
    )
    out = salted_agg(df, ["k"], [("v", "sum", "total")]).collect()
    assert out[0]["total"] == 3.0
