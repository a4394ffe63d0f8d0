"""Windowed streaming aggregations over the prices stream: OHLC
candles on tumbling event-time windows with a watermark for late
data — the natural extension of the reference's 5-minute cadence
(SURVEY.md section 2.8 T5: the reference itself has no event
windows; this is north-star scope).

Append output mode: a candle is emitted exactly once, when the
watermark passes the end of its window.  State is bounded by
(symbols x open windows), and late rows beyond the watermark are
dropped — the explicit late-data contract the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_candles(
    prices: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    tiebreak_col: str | None = None,
    exact_volume: bool = False,
) -> DataFrame:
    """prices (symbol, current_price, total_volume, timestamp) ->
    per-symbol tumbling-window OHLC.  Works on a stream (watermarked,
    incremental state) and, unchanged, on a batch DataFrame.

    ``tiebreak_col`` totals the open/close order: the reference
    stamps one timestamp per poll batch (etl/crypto_etl.py:82), so
    rows tie on event time and min_by/max_by alone would be
    partition-order-dependent.  ``exact_volume`` switches the volume
    sum to order-independent fixed-point accumulation
    (operators/exact.py) for cross-engine determinism."""
    from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import dsum

    df = prices
    if prices.isStreaming:
        df = prices.withWatermark("timestamp", watermark)
    order = (
        F.struct("timestamp", tiebreak_col) if tiebreak_col else F.col("timestamp")
    )
    vol = dsum("total_volume") if exact_volume else F.sum("total_volume")
    return (
        df.groupBy("symbol", F.window("timestamp", window).alias("w"))
        .agg(
            F.min_by("current_price", order).alias("open"),
            F.max("current_price").alias("high"),
            F.min("current_price").alias("low"),
            F.max_by("current_price", order).alias("close"),
            vol.alias("volume"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "open", "high", "low", "close", "volume", "n_ticks",
        )
    )


def vwap_windows(
    prices: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    partials: bool = False,
) -> DataFrame:
    """Streaming twin of ``operators/indicators.py::vwap``: per-symbol
    volume-weighted average price on tumbling event-time windows.
    Works on a stream (watermarked, append-once state bounded by
    symbols x open windows) and, unchanged, on a batch DataFrame —
    the batch form is value-identical to the certified
    ``prices_vwap_hourly`` query because both accumulate the SAME
    fixed-point DECIMAL(38,0) partials (the sums are exact integers, so
    incremental micro-batch accumulation and one-shot batch
    aggregation cannot differ by even an ulp; pinned in
    tests/test_streaming.py).

    ``partials=True`` additionally emits the exact DECIMAL(38,0)
    accumulator columns (``pv``, ``v``) — the state the streaming
    engine sums across micro-batches — for incremental consumers
    that merge window partials themselves and for the
    shuffled-arrival property tests, which pin that any split +
    permutation of the input produces identical partials."""
    from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import SCALE

    df = prices.filter(F.col("total_volume") > 0)
    if prices.isStreaming:
        df = df.withWatermark("timestamp", watermark)
    pv = F.round(F.col("current_price") * F.col("total_volume") * SCALE).cast(
        "decimal(38,0)"
    )
    v = F.round(F.col("total_volume") * SCALE).cast("decimal(38,0)")
    extra = (
        [F.col("__pv").alias("pv"), F.col("__v").alias("v")] if partials else []
    )
    return (
        df.groupBy("symbol", F.window("timestamp", window).alias("w"))
        .agg(
            F.count("*").alias("n_ticks"),
            F.sum(pv).alias("__pv"),
            F.sum(v).alias("__v"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_ticks",
            F.round(F.col("__pv").cast("double") / F.col("__v"), 6).alias("vwap"),
            *extra,
        )
    )
