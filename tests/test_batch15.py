"""Unit + plan tests for the batch-15 operators: Kaplan-Meier
survival (operators/survival.py), BFS shortest hops
(operators/bfs.py), the portable HyperLogLog sketch
(functions/sketch.py hll_*), and lead-lag cross-correlation
(operators/indicators.py::lead_lag_corr).  Query-level equivalence
vs DuckDB is the oracle harness's job; these pin operator semantics
and plan shapes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.sketch import (
    HLL_W,
    hll_merge_estimate,
    hll_registers,
    hll_rho,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.bfs import bfs_hops
from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
    lead_lag_corr,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.survival import (
    km_curve,
)


# ---- Kaplan-Meier -----------------------------------------------------------

def _lifetimes(spark, rows):
    return spark.createDataFrame(rows, ["duration_weeks", "churned"])


def test_km_textbook_example(spark):
    # durations 1,1,2,3,3,3 with churn flags T,F,T,T,F,F:
    #   week 1: n=6 d=1 -> 1e6*5//6          = 833333
    #   week 2: n=4 d=1 -> 833333*3//4       = 624999
    #   week 3: n=3 d=1 -> 624999*2//3       = 416666
    rows = [(1, True), (1, False), (2, True), (3, True), (3, False), (3, False)]
    out = {r["week"]: r for r in km_curve(_lifetimes(spark, rows)).collect()}
    assert out[1]["n_risk"] == 6 and out[1]["deaths"] == 1
    assert out[1]["survival_ppm"] == 833333
    assert out[2]["n_risk"] == 4 and out[2]["survival_ppm"] == 624999
    assert out[3]["n_risk"] == 3 and out[3]["survival_ppm"] == 416666


def test_km_censoring_is_not_death(spark):
    # an all-censored cohort never loses survival mass
    rows = [(1, False), (2, False), (3, False)]
    out = km_curve(_lifetimes(spark, rows)).collect()
    assert all(r["survival_ppm"] == 1_000_000 for r in out)
    assert all(r["deaths"] == 0 for r in out)


def test_km_survival_monotone_nonincreasing(spark):
    rows = [(w % 5, w % 3 == 0) for w in range(40)]
    out = km_curve(_lifetimes(spark, rows)).orderBy("week").collect()
    su = [r["survival_ppm"] for r in out]
    assert su == sorted(su, reverse=True)
    assert all(0 <= s <= 1_000_000 for s in su)


def test_km_single_corpus_shuffle(spark):
    from tests.test_plans import plan_of

    rows = [(w % 4, w % 2 == 0) for w in range(20)]
    plan = plan_of(km_curve(_lifetimes(spark, rows)))
    # the duration histogram is the only hash shuffle; the risk-set
    # window and fold run single-partition on the O(weeks) grid
    assert plan.count("Exchange hashpartitioning") <= 1


# ---- BFS shortest hops ------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_bfs_hop_counts_line_graph(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["hops"] for r in bfs_hops(e, 1, 2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # 4, 5 beyond max_hops


def test_bfs_diamond_takes_min(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1)])
    out = {r["node"]: r["hops"] for r in bfs_hops(e, 1, 4).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}  # one row per node, min hops


def test_bfs_cycle_terminates_unreachable_absent(spark):
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (7, 8)])
    out = {r["node"]: r["hops"] for r in bfs_hops(e, 1, 5).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # 7, 8 unreachable


# ---- HyperLogLog ------------------------------------------------------------

def test_hll_rho_boundaries(spark):
    df = spark.range(1).select(
        hll_rho(F.lit(0)).alias("zero"),
        hll_rho(F.lit(1)).alias("one"),
        hll_rho(F.lit(1 << (HLL_W - 1))).alias("top"),
        hll_rho(F.lit((1 << HLL_W) - 1)).alias("all_ones"),
    ).collect()[0]
    assert df["zero"] == HLL_W + 1
    assert df["one"] == HLL_W      # only the lowest bit set
    assert df["top"] == 1          # top bit of the window set
    assert df["all_ones"] == 1


def test_hll_merge_equals_single_sketch(spark):
    # registers built per-half and merged == registers of one pass:
    # the max-merge is lossless by construction
    ids = spark.range(4000).select(
        F.col("id"), (F.col("id") % 2).alias("half")
    )
    split = hll_registers(ids, "id", "half")
    whole = hll_registers(ids.select("id"), "id")
    merged = hll_merge_estimate(split).collect()[0]
    single = hll_merge_estimate(whole).collect()[0]
    assert merged["n_estimate"] == single["n_estimate"]
    assert merged["registers_filled"] == single["registers_filled"]


def test_hll_estimate_accuracy(spark):
    # m=64 -> relative standard error ~1.04/8 = 13%; assert a
    # generous 3-sigma band on 5k distinct (deterministic md5 hash,
    # so this can never flake)
    n = 5000
    est = hll_merge_estimate(
        hll_registers(spark.range(n), "id")
    ).collect()[0]["n_estimate"]
    assert abs(est - n) / n < 0.4


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.range(3000)
    dup3 = base.unionByName(base).unionByName(base)
    e1 = hll_merge_estimate(hll_registers(base, "id")).collect()[0]
    e2 = hll_merge_estimate(hll_registers(dup3, "id")).collect()[0]
    assert e1["n_estimate"] == e2["n_estimate"]


def test_hll_register_agg_is_one_shuffle(spark):
    from tests.test_plans import plan_of

    plan = plan_of(hll_registers(spark.range(100), "id"))
    # map-side combinable: partial max before the single exchange
    assert plan.count("Exchange") <= 1
    assert "partial_max" in plan


# ---- lead-lag correlation ---------------------------------------------------

def test_lead_lag_detects_one_day_shift(spark):
    # symbol b's price today is symbol a's price yesterday, so b's
    # return at t+1 equals a's return at t: corr(lag=+1) must be 1.0
    import itertools

    rets = [0.10, -0.05, 0.20, 0.01, -0.15, 0.08, -0.02, 0.12, -0.07, 0.05]
    pa = list(itertools.accumulate(rets, lambda p, r: p * (1 + r), initial=100.0))
    rows = []
    for d, p in enumerate(pa):
        t = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        rows.append(("a", p, t, 2 * d))
        if d >= 1:
            rows.append(("b", pa[d - 1], t, 2 * d + 1))
    prices = spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])
    out = lead_lag_corr(
        prices, key="symbol", ts_col="t", price="price",
        tiebreak="event_id", top_n=2, lags=(-1, 0, 1), min_obs=3,
    ).collect()
    by_lag = {r["lag"]: r["corr"] for r in out}
    assert by_lag[1] == 1.0
    assert by_lag[-1] < 1.0 and by_lag[0] < 1.0
