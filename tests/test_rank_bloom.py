"""Distributed exact rank (operators/rank.py), the Bloom filter
(functions/sketch.py), and TWAP (operators/indicators.py): hand
fixtures with closed-form answers plus the operator invariants the
certified queries rely on."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.sketch import (
    bloom_bits,
    bloom_semi_filter,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import twap
from crypto_price_tracker_with_etl_dashboard_spark.operators.rank import (
    global_rank,
    quantile_bucket,
)


# ---- global_rank ------------------------------------------------------------

def test_global_rank_matches_sequential(spark):
    vals = [5.0, 1.0, 3.0, 3.0, 2.0, 8.0, 0.5, 7.5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    out = global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], F.floor(F.col("v"))
    ).collect()
    expected = {
        id_: r + 1
        for r, (v, id_) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    assert {r["id"]: r["rank"] for r in out} == expected


def test_global_rank_ranks_are_a_permutation(spark):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    out = global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], F.col("v") / 10
    ).select("rank").collect()
    assert sorted(r["rank"] for r in out) == list(range(1, 501))


def test_global_rank_no_partitionless_window_over_rows(spark):
    """The only partitionless window must run over the bucket totals
    (O(buckets) rows), never the input relation: the input reaches
    its window already partitioned by __rb."""
    from tests.test_plans import plan_of

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 97).alias("v"))
    plan = plan_of(
        global_rank(df, [F.col("v").asc(), F.col("id").asc()], F.col("v"))
    )
    # the row-level window carries the bucket partition key
    assert "partitionspec=[__rb" in plan.replace(" ", "").lower() or "__rb" in plan


def test_quantile_bucket_closed_form(spark):
    df = spark.createDataFrame(
        [(r,) for r in range(1, 11)], ["rank"]
    )
    out = df.select(
        "rank", quantile_bucket(F.col("rank"), F.lit(10), 5).alias("q")
    ).collect()
    # 10 rows, 5 buckets: ranks 1-2 -> 1, 3-4 -> 2, ..., 9-10 -> 5
    assert {r["rank"]: r["q"] for r in out} == {
        1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4, 9: 5, 10: 5
    }


# ---- Bloom filter -----------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 200, 3).select(F.col("id").alias("k"))  # 67 keys
    bits = bloom_bits(build, "k", k=4, m=1024)
    probe = spark.range(0, 200).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_semi_filter(probe, "k", bits, k=4, m=1024).collect()}
    members = {r["k"] for r in build.collect()}
    assert members <= passed  # every member survives


def test_bloom_filters_most_non_members(spark):
    build = spark.range(0, 50).select(F.col("id").alias("k"))
    bits = bloom_bits(build, "k", k=4, m=4096)
    probe = spark.range(1000, 3000).select(F.col("id").alias("k"))  # all non-members
    n_pass = bloom_semi_filter(probe, "k", bits, k=4, m=4096).count()
    # load factor 200/4096 -> fp ~ (1-e^-0.049)^4 ~ 5e-6; allow slack
    assert n_pass <= 5


def test_bloom_probe_side_never_shuffles(spark):
    from tests.test_plans import plan_of

    build = spark.range(0, 50).select(F.col("id").alias("k"))
    bits = bloom_bits(build, "k")
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = plan_of(bloom_semi_filter(probe, "k", bits))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# ---- TWAP -------------------------------------------------------------------

def test_twap_holding_time_weights(spark):
    # one symbol, one day: price 10 held 60s, price 20 held till
    # day end (86400 - 120 = 86280s)
    t0 = dt.datetime(2024, 1, 1, 0, 1, 0)
    rows = [
        ("a", 10.0, t0, 1),
        ("a", 20.0, t0 + dt.timedelta(seconds=60), 2),
    ]
    df = spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])
    out = twap(df, "symbol", "t", "price", "event_id", bucket="day").collect()
    assert len(out) == 1
    r = out[0]
    total = 86400 - 60  # from first tick to day end
    expected = (10.0 * 60 + 20.0 * (86400 - 120)) / total
    assert r["covered_sec"] == total
    assert r["twap"] == round(expected, 6)


def test_twap_subsecond_repeat_gets_zero_weight(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("a", 999.0, t0, 1),  # same floor-second as the next tick
        ("a", 10.0, t0 + dt.timedelta(milliseconds=500), 2),
    ]
    df = spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])
    out = twap(df, "symbol", "t", "price", "event_id", bucket="day").collect()
    # 999 held 0 whole seconds -> contributes nothing
    assert out[0]["twap"] == 10.0
