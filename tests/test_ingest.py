"""Ingest validate/project/normalize semantics (etl/crypto_etl.py:
82-106): required-field drops, null-tolerant optional fields,
lowercase normalization, batch-constant timestamp."""

from __future__ import annotations

import datetime as dt

from crypto_price_tracker_with_etl_dashboard_spark.sources import (
    coingecko_rows_to_df,
    validate_and_normalize,
)

BATCH_TS = dt.datetime(2024, 3, 1, 12, 0, 0)

RAW = [
    {"symbol": "BTC", "name": "Bitcoin", "current_price": 100.0,
     "market_cap": 1e9, "total_volume": 1e6, "extra_field": "noise"},
    {"symbol": None, "name": "NoSym", "current_price": 1.0},     # dropped
    {"symbol": "ETH", "name": None, "current_price": 2.0},      # dropped
    {"symbol": "SOL", "name": "Solana", "current_price": None}, # dropped
    {"symbol": "ADA", "name": "Cardano", "current_price": 3.0,
     "market_cap": None, "total_volume": None},                  # kept
]


def test_required_field_rows_dropped(spark):
    out = validate_and_normalize(coingecko_rows_to_df(spark, RAW), BATCH_TS).collect()
    assert sorted(r["symbol"] for r in out) == ["ada", "btc"]


def test_nullable_fields_survive(spark):
    out = {r["symbol"]: r for r in
           validate_and_normalize(coingecko_rows_to_df(spark, RAW), BATCH_TS).collect()}
    assert out["ada"]["market_cap"] is None
    assert out["ada"]["total_volume"] is None


def test_symbol_lowercased_and_extra_dropped(spark):
    df = validate_and_normalize(coingecko_rows_to_df(spark, RAW), BATCH_TS)
    assert "extra_field" not in df.columns
    assert {r["symbol"] for r in df.collect()} == {"btc", "ada"}


def test_batch_constant_timestamp(spark):
    """One now() per batch stamped on every row (etl/crypto_etl.py:82)
    — NOT per-row current_timestamp(); tie semantics depend on it."""
    out = validate_and_normalize(coingecko_rows_to_df(spark, RAW), BATCH_TS).collect()
    assert {r["timestamp"] for r in out} == {BATCH_TS}


def test_batch_and_stream_write_layouts_agree(spark, tmp_path):
    """The facade's batch append and the streaming sink must produce
    ONE table layout — (dt, batch) partitions + event_id — or mixing
    the two write paths breaks partition discovery outright and the
    batch path loses the keep-last tiebreak."""
    import datetime as dt

    from crypto_price_tracker_with_etl_dashboard_spark.api import PriceTracker

    table = str(tmp_path / "prices")
    tr = PriceTracker(spark, table)
    rows = [
        {"symbol": "BTC", "name": "Bitcoin", "current_price": 1.0,
         "market_cap": 10.0, "total_volume": 5.0},
        {"symbol": "BTC", "name": "Bitcoin", "current_price": 2.0,
         "market_cap": 11.0, "total_volume": 6.0},
    ]
    n = tr.ingest_batch(rows, batch_ts=dt.datetime(2024, 1, 1, 12, 0, 0))
    assert n == 2
    df = spark.read.parquet(table)
    assert {"batch", "event_id"} <= set(df.columns)
    # keep-last within the batch-constant timestamp: the SECOND row
    # wins via the event_id tiebreak, deterministically
    (latest,) = tr.latest().collect()
    assert latest["current_price"] == 2.0


def test_load_table_does_not_leak_nanos_conf(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
    from tests.conftest import SF_SMALL

    key = "spark.sql.legacy.parquet.nanosAsLong"
    df = load_table(spark, SF_SMALL, "events")
    assert spark.conf.get(key, None) in (None, "false")
    assert df.count() > 0  # scoped conf: the read still executes
