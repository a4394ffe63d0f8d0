"""End-to-end market-risk report — the composition a risk desk runs
nightly over the tick store, in review order:

  1. tail risk: 95% historical VaR per symbol (exact k-th order
     statistic, prices_var_historical's machinery) — the headline
     number
  2. conditional volatility: GARCH(1,1) current vol per symbol (the
     certified integer recursion) — is risk CLUSTERING right now?
  3. path risk: maximum drawdown — the worst already-realized loss
  4. liquidity: Amihud price impact — can the position actually be
     unwound at these marks?
  5. positioning context: the volume-at-price profile's top band per
     symbol — where the inventory likely sits

Every stage is certified piecewise by driver-oracle rows
(prices_var_historical, prices_garch_vol, prices_max_drawdown,
prices_amihud, prices_volume_profile); this module is the
composition, smoke-tested in tests/test_examples.py.

Run:  python examples/risk_report_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the worst-risk symbols).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_risk_report(spark, sf_dir: str, top_n: int = 5) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_amihud,
        q_prices_garch_vol,
        q_prices_max_drawdown,
        q_prices_var_historical,
        q_prices_volume_profile,
    )

    stats: dict = {}

    # 1. tail risk — the symbols with the deepest 5th-percentile loss
    var = q_prices_var_historical(spark, sf_dir)
    worst_var = var.orderBy(F.col("var95_ppm").asc()).limit(top_n).collect()
    stats["worst_var"] = [(r["symbol"], r["var95_ppm"]) for r in worst_var]

    # 2. conditional volatility — each symbol's LAST GARCH state
    garch = q_prices_garch_vol(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy(F.col("rn").desc())
    current = (
        garch.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("symbol", "vol_ppm")
    )
    hot = current.orderBy(F.col("vol_ppm").desc()).limit(top_n).collect()
    stats["hottest_vol"] = [(r["symbol"], r["vol_ppm"]) for r in hot]

    # 3. path risk
    dd = q_prices_max_drawdown(spark, sf_dir)
    worst_dd = dd.orderBy(F.col("max_drawdown").desc()).limit(top_n).collect()
    stats["worst_drawdown"] = [
        (r["symbol"], r["max_drawdown"]) for r in worst_dd
    ]

    # 4. liquidity — thinnest markets first (already sorted)
    illiq = q_prices_amihud(spark, sf_dir).limit(top_n).collect()
    stats["thinnest"] = [(r["symbol"], r["amihud_q"]) for r in illiq]

    # 5. positioning — the dominant price band per symbol
    vp = q_prices_volume_profile(spark, sf_dir)
    wb = Window.partitionBy("symbol").orderBy(
        F.col("volume_cents").desc(), F.col("band").asc()
    )
    dom = (
        vp.withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") == 1)
    )
    stats["n_symbols"] = dom.count()
    stats["dominant_band_histogram"] = {
        r["band"]: r["n"]
        for r in dom.groupBy("band").agg(F.count("*").alias("n")).collect()
    }
    return stats


def main(sf_dir: str) -> None:
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    spark = get_spark("risk-report-example")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run_risk_report(spark, sf_dir).items():
        print(f"{k:24}: {v}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
