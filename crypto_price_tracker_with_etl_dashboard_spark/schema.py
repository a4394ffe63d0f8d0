"""Canonical schemas.

The ``prices`` fact table mirrors the reference's PostgreSQL table
(inferred from the INSERT at etl/crypto_etl.py:110-113 and the
numeric-string coercion at api/server.js:50-58): an append-only
time series keyed by (symbol, timestamp), with nullable market_cap /
total_volume and a batch-constant timestamp (etl/crypto_etl.py:82).

``COINGECKO_RAW_SCHEMA`` models the semi-structured upstream payload
(etl/crypto_etl.py:15-22,88-92): every field nullable, extra fields
ignored by projection.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PRICES_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField("current_price", DoubleType(), nullable=False),
        StructField("market_cap", DoubleType(), nullable=True),
        StructField("total_volume", DoubleType(), nullable=True),
        StructField("timestamp", TimestampType(), nullable=False),
    ]
)

PRICES_COLUMNS = [f.name for f in PRICES_SCHEMA.fields]

# Upstream CoinGecko /coins/markets JSON: null-tolerant, superset of
# the projected fields (the real payload has ~30; we type the 5 we
# keep — from_json drops the rest, like .get() in the reference).
COINGECKO_RAW_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), nullable=True),
        StructField("name", StringType(), nullable=True),
        StructField("current_price", DoubleType(), nullable=True),
        StructField("market_cap", DoubleType(), nullable=True),
        StructField("total_volume", DoubleType(), nullable=True),
    ]
)
