"""Dashboard aggregates (SURVEY.md section 2: O4+A2+D2 top-K with
"Other" rollup, A3/A4 ratio-of-total, A5+O5 distinct-sorted symbols).

The reference computes these client-side over the <=100-row snapshot
(frontend/src/App.js:87-142,463-471,569-570); here they are DataFrame
ops that stay correct when the snapshot is millions of series.  The
top-K uses a rank window over an already-aggregated (<= |symbols|
rows) input; Spark turns the global sort + filter into TakeOrdered.
All double sums go through exact decimal accumulation (operators/
exact.py) so results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import dsum


def _positive_caps(snapshot: DataFrame) -> DataFrame:
    # frontend/src/App.js:94 — keep market_cap non-null and > 0.
    return snapshot.filter(F.col("market_cap").isNotNull() & (F.col("market_cap") > 0))


def topk_with_other(snapshot: DataFrame, k: int = 7) -> DataFrame:
    """Top-K symbols by market cap plus a synthetic 'Other' row
    holding the sum of the remainder (frontend/src/App.js:99-129).
    Ties broken by symbol ascending for determinism."""
    ranked = _positive_caps(snapshot).withColumn(
        "__rank",
        F.row_number().over(
            Window.orderBy(F.col("market_cap").desc(), F.col("symbol").asc())
        ),
    )
    top = ranked.filter(F.col("__rank") <= k).select(
        F.upper(F.col("symbol")).alias("label"), F.col("market_cap")
    )
    other = (
        ranked.filter(F.col("__rank") > k)
        .agg(dsum("market_cap", "market_cap"))
        .select(F.lit("Other").alias("label"), "market_cap")
        .filter(F.col("market_cap").isNotNull())
    )
    return top.unionByName(other)


def market_share(snapshot: DataFrame, k: int = 7) -> DataFrame:
    """Percentage-of-total per segment of the top-K+Other breakdown
    (frontend/src/App.js:463-471): value / sum(values) * 100, 2 dp."""
    segments = topk_with_other(snapshot, k)
    total = segments.agg(dsum("market_cap", "total")).select("total")
    return (
        segments.crossJoin(F.broadcast(total))
        .select(
            "label",
            "market_cap",
            F.round(F.col("market_cap") / F.col("total") * 100.0, 2).alias("pct"),
        )
    )


def distinct_symbols(prices: DataFrame) -> DataFrame:
    """Unique symbols, lexicographically sorted (the dropdown,
    frontend/src/App.js:569-570)."""
    return prices.select("symbol").distinct().orderBy("symbol")
