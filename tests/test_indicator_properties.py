"""Property-based checks (hypothesis) for the indicator / funnel /
profile operators: distributed implementations must satisfy the
mathematical invariants of their definitions on arbitrary inputs.
Example counts stay small — each example is a full Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.operators.funnel import funnel
from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
    max_drawdown,
    rsi,
    vwap,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.profile import profile

EXAMPLES = 8

prices_lists = st.lists(
    st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
    min_size=2,
    max_size=40,
)


def _series(spark, prices):
    rows = [
        ("s", float(p), dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i)
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(rows, ["symbol", "price", "t", "event_id"])


@settings(max_examples=EXAMPLES, deadline=None)
@given(prices_lists)
def test_rsi_bounded_0_100(spark, prices):
    out = rsi(_series(spark, prices), "symbol", ["t", "event_id"], "price",
              period=min(5, len(prices) - 1)).collect()
    assert all(0.0 <= r["rsi"] <= 100.0 for r in out)


@settings(max_examples=EXAMPLES, deadline=None)
@given(prices_lists)
def test_max_drawdown_in_unit_interval_and_matches_reference(spark, prices):
    out = max_drawdown(_series(spark, prices), "symbol", ["t", "event_id"],
                       "price").collect()
    assert len(out) == 1
    dd = out[0]["max_drawdown"]
    assert 0.0 <= dd < 1.0
    # sequential reference
    peak, ref = prices[0], 0.0
    for p in prices:
        peak = max(peak, p)
        ref = max(ref, (peak - p) / peak)
    assert abs(dd - ref) < 1e-6


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
            st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_vwap_matches_fixed_point_reference(spark, ticks):
    import math

    rows = [
        ("s", float(p), float(v), dt.datetime(2024, 1, 1, 0, i % 60))
        for i, (p, v) in enumerate(ticks)
    ]
    df = spark.createDataFrame(rows, ["symbol", "price", "vol", "t"])
    out = vwap(df, "symbol", "t", "price", "vol").collect()
    assert len(out) == 1
    # sequential reference with the SAME fixed-point quantization
    # (HALF_UP, 1e-4 units).  NB the quantization error is relative to
    # the VOLUME magnitude (0.5/(v*1e4) per term), so a plain
    # min<=vwap<=max range check is wrong for tiny volumes.
    hu = lambda x: math.floor(x * 10_000 + 0.5)  # noqa: E731
    num = sum(hu(p * v) for p, v in ticks)
    den = sum(hu(v) for _, v in ticks)
    assert out[0]["vwap"] == round(num / den, 6)
    assert out[0]["n_ticks"] == len(ticks)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),          # user
            st.sampled_from(["a", "b", "c"]),               # stage type
            st.integers(min_value=0, max_value=500),        # minute offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_counts_monotone_nonincreasing(spark, events):
    rows = [
        (u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
        for u, t, m in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = [
        r["n_users"]
        for r in funnel(df, ["a", "b", "c"]).orderBy("stage_idx").collect()
    ]
    assert out == sorted(out, reverse=True)
    assert all(n >= 0 for n in out)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_profile_invariants(spark, rows):
    # explicit schema: an all-None v column defeats type inference
    df = spark.createDataFrame(rows, "k int, v int")
    out = {r["column"]: r for r in profile(df, ["k", "v"]).collect()}
    ks = [k for k, _ in rows]
    vs = [v for _, v in rows if v is not None]
    assert out["k"]["n_rows"] == len(rows)
    assert out["k"]["n_distinct"] == len(set(ks))
    assert out["v"]["n_nulls"] == sum(1 for _, v in rows if v is None)
    assert out["v"]["n_distinct"] == len(set(vs))
    if vs:
        assert out["v"]["min_value"] == str(min(vs))
        assert out["v"]["max_value"] == str(max(vs))
    else:
        assert out["v"]["min_value"] is None and out["v"]["max_value"] is None
