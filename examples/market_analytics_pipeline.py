"""End-to-end market-analytics pipeline — the dashboard-tier
composition a price-tracker consumer builds on top of the raw
ingest (the reference stops at the raw chart; these are the derived
layers, in serving order):

  1. indicators: hourly VWAP + daily TWAP (the execution-quality
     benchmark pair), Bollinger bands and the stochastic oscillator
     (the chart overlays), RSI-14 and EMA-12/26 + MACD (momentum)
  2. risk: per-symbol max drawdown and OLS trend, the top-40
     daily-return correlation matrix (portfolio co-movement)
  3. alerts: robust MAD price-jump detection over ppb returns —
     the forensic twin of the streaming hopping-window alerts
     (streaming/alerts.py)

Everything composes lazily from ONE prices relation (derived from
events, sources/tables.py::prices_from_events) — Catalyst sees the
whole plan; every stage is certified piecewise by driver-oracle
rows (prices_vwap_hourly, prices_twap_daily, prices_bollinger,
prices_stochastic, prices_rsi, prices_ema_macd, prices_max_drawdown,
prices_trend, prices_corr_matrix, prices_jump_detect).

Run:  python examples/market_analytics_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the per-stage summary).
Smoke-tested in tests/test_examples.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def analyze(spark, sf_dir: str) -> dict:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
        bollinger,
        ema_macd,
        max_drawdown,
        ols_trend,
        pairwise_corr,
        rsi,
        stochastic,
        twap,
        vwap,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        jump_detect,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import (
        prices_from_events,
    )

    prices = prices_from_events(spark, sf_dir)
    ob = ["timestamp", "event_id"]

    # 1. indicators
    stats = {}
    v = vwap(prices, "symbol", "timestamp", "current_price", "total_volume")
    t = twap(prices, "symbol", "timestamp", "current_price", "event_id")
    bb = bollinger(prices, "symbol", ob, "current_price")
    st = stochastic(prices, "symbol", ob, "current_price")
    r = rsi(prices, "symbol", ob, "current_price")
    em = ema_macd(prices, "symbol", ob, "current_price")
    stats["vwap"] = v.count()
    stats["twap"] = t.count()
    stats["bollinger"] = bb.count()
    stats["stochastic"] = st.count()
    stats["rsi"] = r.count()
    stats["ema_macd"] = em.count()

    # 2. risk
    dd = max_drawdown(prices, "symbol", ob, "current_price")
    tr = ols_trend(prices, "symbol", ob, "current_price")
    corr = pairwise_corr(
        prices, "symbol", "timestamp", "current_price", "event_id",
        top_n=10, min_obs=5, bucket="day",
    )
    stats["drawdown"] = dd.count()
    stats["worst"] = [
        w["symbol"]
        for w in dd.orderBy(F.col("max_drawdown").desc(), "symbol").limit(3).collect()
    ]
    stats["trend"] = tr.count()
    stats["corr_pairs"] = corr.count()

    # 3. alerts
    stats["jump_alerts"] = jump_detect(prices).count()
    return stats


def main(sf_dir: str) -> None:
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    spark = get_spark("market-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")
    for k, val in analyze(spark, sf_dir).items():
        print(f"{k:16}: {val}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
