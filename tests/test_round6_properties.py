"""Property-based checks (hypothesis) for the round-6 operators:
distributed implementations must satisfy the mathematical
invariants of their definitions on arbitrary inputs.  Example
counts stay small — each example is a full Spark job."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
    bollinger,
    stochastic,
    twap,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.rank import global_rank

EXAMPLES = 6

prices_lists = st.lists(
    st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
    min_size=2,
    max_size=30,
)


def _series(spark, prices):
    rows = [
        ("s", float(p), dt.datetime(2024, 1, 1) + dt.timedelta(minutes=7 * i), i)
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])


@settings(max_examples=EXAMPLES, deadline=None)
@given(prices_lists)
def test_bollinger_bands_bracket_the_sma(spark, prices):
    period = min(4, len(prices))
    out = bollinger(
        _series(spark, prices), "symbol", ["t", "event_id"], "price",
        period=period,
    ).collect()
    for r in out:
        assert r["band_lo"] <= r["sma"] <= r["band_hi"]


@settings(max_examples=EXAMPLES, deadline=None)
@given(prices_lists)
def test_stochastic_k_and_d_bounded(spark, prices):
    kp = min(4, len(prices))
    out = stochastic(
        _series(spark, prices), "symbol", ["t", "event_id"], "price",
        k_period=kp, d_period=2,
    ).collect()
    for r in out:
        assert 0.0 <= r["stoch_k"] <= 100.0
        assert 0.0 <= r["stoch_d"] <= 100.0


@settings(max_examples=EXAMPLES, deadline=None)
@given(prices_lists)
def test_twap_inside_price_envelope(spark, prices):
    out = twap(
        _series(spark, prices), "symbol", "t", "price", "event_id",
        bucket="day",
    ).collect()
    lo, hi = min(prices), max(prices)
    for r in out:
        # weighted mean of observed prices cannot leave their range
        # (allow the 1e-4 quantization grain at the edges)
        assert lo - 1e-4 <= r["twap"] <= hi + 1e-4


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1, max_size=60,
    )
)
def test_global_rank_equals_sequential_sort(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"]
    )
    out = global_rank(
        df, [F.col("v").asc(), F.col("id").asc()], F.floor(F.col("v") / 7)
    ).collect()
    expected = {
        id_: r + 1
        for r, (v, id_) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    assert {r["id"]: r["rank"] for r in out} == expected
