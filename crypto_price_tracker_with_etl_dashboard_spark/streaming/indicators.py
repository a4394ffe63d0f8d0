"""Streaming EMA/MACD: the stateful streaming twin of the batch
``operators/indicators.py::ema_macd`` (certified as the
``prices_ema_macd`` oracle row), via ``applyInPandasWithState`` —
the same pattern as the sessionize and VWAP twins: the batch
operator defines the semantics, the stream produces value-IDENTICAL
results incrementally.

State model (per key): the recursion state ``(ef, es, rn)`` — two
fixed-point BIGINT EMA accumulators and the 1-based tick index.
Each micro-batch sorts its own rows by event time and folds them
into the state with the IDENTICAL integer recursion the batch
operator and the DuckDB oracle use:

    eu_t = (2*xu_t + (n-1)*eu_{t-1} + (n+1)//2) // (n+1)

so after any prefix of in-order micro-batches the emitted rows match
the batch operator run over the concatenated input bit-for-bit
(asserted in test_streaming).

Ordering contract: WITHIN a micro-batch any arrival order is fine
(rows are sorted by event time before folding, ties by arrival
order); ACROSS micro-batches events must not regress behind an
already-folded tick — an EMA state cannot be rewound (same
O(1)-state trade-off the sessionize twin documents for its
single-interval model).  Feeds that can deliver cross-batch
out-of-order ticks should run the batch operator over at-rest data.

Scale shape: state is hash-partitioned by key in the state store —
3 longs per key; each micro-batch shuffles only its own rows; output
is one row per input event (append mode).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import SCALE

EMA_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("rn", LongType()),
        StructField("ema_fast", DoubleType()),
        StructField("ema_slow", DoubleType()),
        StructField("macd", DoubleType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [
        StructField("ef", LongType()),
        StructField("es", LongType()),
        StructField("rn", LongType()),
    ]
)


def make_ema_fn(fast: int = 12, slow: int = 26):
    if not (1 <= fast < slow):
        raise ValueError(f"need 1 <= fast < slow, got {fast}, {slow}")
    hf, hs = (fast + 1) // 2, (slow + 1) // 2

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (sym,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return
        rows = []
        for i_pdf, pdf in enumerate(pdfs):
            for i_row in range(len(pdf)):
                t = pdf["ts"].iloc[i_row]
                p = pdf["price"].iloc[i_row]
                if pd.isna(t) or pd.isna(p):
                    continue
                rows.append((t, i_pdf, i_row, float(p)))
        if not rows:
            return
        # event-time order; ties keep arrival order (stable by the
        # (batch, row) tuple) — the batch operator's tiebreak column
        # plays this role at rest
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        ef, es, rn = state.get if state.exists else (0, 0, 0)
        out_ts, out_rn, out_ef, out_es = [], [], [], []
        for t, _b, _i, p in rows:
            # HALF_UP like Spark's F.round / DuckDB round (prices are
            # nonnegative); Python round() is HALF_EVEN — not it
            xu = int(math.floor(p * SCALE + 0.5))
            if rn == 0:
                ef = es = xu
            else:
                ef = (2 * xu + (fast - 1) * ef + hf) // (fast + 1)
                es = (2 * xu + (slow - 1) * es + hs) // (slow + 1)
            rn += 1
            out_ts.append(t)
            out_rn.append(rn)
            out_ef.append(ef)
            out_es.append(es)
        state.update((ef, es, rn))
        yield pd.DataFrame(
            {
                "symbol": [sym] * len(out_rn),
                "ts": out_ts,
                "rn": out_rn,
                "ema_fast": [v / SCALE for v in out_ef],
                "ema_slow": [v / SCALE for v in out_es],
                "macd": [(f - s) / SCALE for f, s in zip(out_ef, out_es)],
            }
        )

    return fold


def streaming_ema_macd(
    prices_stream: DataFrame,
    key: str = "symbol",
    ts_col: str = "timestamp",
    price: str = "current_price",
    fast: int = 12,
    slow: int = 26,
) -> DataFrame:
    """prices stream -> append-mode stream of per-tick EMA/MACD rows
    (one output row per input tick, exactly the batch operator's
    rows)."""
    from pyspark.sql import functions as F

    return (
        prices_stream.select(
            F.col(key).cast("string").alias("symbol"),
            F.col(ts_col).alias("ts"),
            F.col(price).cast("double").alias("price"),
        )
        .groupBy("symbol")
        .applyInPandasWithState(
            make_ema_fn(fast, slow),
            outputStructType=EMA_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
