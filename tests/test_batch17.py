"""Unit tests for the batch-17 operators: Sharpe ratio
(operators/indicators.py::sharpe_ratio) and the closed-form
two-feature OLS expression chain (queries/olap.py::_OLS2_EXPRS).
Query-level equivalence vs DuckDB is the oracle harness's job."""

from __future__ import annotations

import datetime as dt
import itertools
import math

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
    sharpe_ratio,
)


def _daily_prices(spark, rets, symbol="s"):
    pa = list(itertools.accumulate(rets, lambda p, r: p * (1 + r), initial=100.0))
    rows = [
        (symbol, p, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=d), d)
        for d, p in enumerate(pa)
    ]
    return spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])


def test_sharpe_matches_closed_form(spark):
    rets = [0.10, -0.05, 0.20, 0.01, -0.15, 0.08, -0.02, 0.12, -0.07, 0.05]
    out = sharpe_ratio(
        _daily_prices(spark, rets), key="symbol", ts_col="t",
        price="price", tiebreak="event_id", min_obs=5,
    ).collect()
    assert len(out) == 1
    # expected from the SAME ppb quantization the operator certifies
    q = [round(r * 1e9) for r in rets]
    n = len(q)
    mean = sum(q) / n
    var = (n * sum(x * x for x in q) - sum(q) ** 2) / (n * (n - 1))
    expected = mean / math.sqrt(var) * math.sqrt(365.0)
    assert abs(out[0]["sharpe_annualized"] - expected) < 1e-4
    assert out[0]["n_obs"] == n


def test_sharpe_constant_price_filtered_out(spark):
    # zero variance -> no Sharpe (division guard, mirrored in SQL)
    out = sharpe_ratio(
        _daily_prices(spark, [0.0] * 12), key="symbol", ts_col="t",
        price="price", tiebreak="event_id", min_obs=5,
    ).collect()
    assert out == []


def test_sharpe_min_obs_gate(spark):
    out = sharpe_ratio(
        _daily_prices(spark, [0.1, -0.1, 0.2]), key="symbol", ts_col="t",
        price="price", tiebreak="event_id", min_obs=10,
    ).collect()
    assert out == []


def test_ols2_recovers_exact_plane(spark):
    # y = 2 + 3*x1 - x2 with NO noise: coefficients exact, r2 = 1
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        _OLS2_EXPRS,
    )

    pts = [
        (float(x1), float(x2), 2.0 + 3.0 * x1 - x2)
        for x1 in range(6)
        for x2 in range(5)
    ]
    feats = spark.createDataFrame(pts, "x1 double, x2 double, y double").select(
        F.col("x1").cast("decimal(38,0)").alias("x1"),
        F.col("x2").cast("decimal(38,0)").alias("x2"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    agg = feats.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("S1"), F.sum("x2").alias("S2"), F.sum("y").alias("Sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("S11"),
        F.sum(F.col("x1") * F.col("x2")).alias("S12"),
        F.sum(F.col("x2") * F.col("x2")).alias("S22"),
        F.sum(F.col("x1") * F.col("y")).alias("S1y"),
        F.sum(F.col("x2") * F.col("y")).alias("S2y"),
        F.sum(F.col("y") * F.col("y")).alias("Syy"),
    )
    casted = agg.select(
        F.col("n").cast("double").alias("nd"),
        *[
            F.col(c).cast("double").alias(c.lower())
            for c in ["S1", "S2", "Sy", "S11", "S12", "S22", "S1y", "S2y", "Syy"]
        ],
    )
    row = casted.selectExpr(*_OLS2_EXPRS).collect()[0]
    assert row["b0"] == 2.0
    assert row["b1"] == 3.0
    assert row["b2"] == -1.0
    assert row["r2"] == 1.0
