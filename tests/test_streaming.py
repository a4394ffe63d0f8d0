"""Streaming pipeline tests (SURVEY.md section 5.4): micro-batch
ingest through foreachBatch, snapshot monotonicity, failed-batch
isolation, and the pure-streaming stateful snapshot."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.schema import COINGECKO_RAW_SCHEMA
from crypto_price_tracker_with_etl_dashboard_spark.streaming import run_ingest_stream


def _write_raw_batch(spark, path, rows):
    spark.createDataFrame(rows, schema=COINGECKO_RAW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


BATCH1 = [
    ("BTC", "Bitcoin", 100.0, 1e9, 1e6),
    ("ETH", "Ethereum", 50.0, 5e8, 1e5),
    (None, "Bad", 1.0, None, None),  # dropped by validation
]
BATCH2 = [
    ("BTC", "Bitcoin", 110.0, 1.1e9, 1e6),
    ("SOL", "Solana", 20.0, 2e8, 5e4),
]


def test_ingest_stream_end_to_end(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    table = str(tmp_path / "prices")
    ckpt = str(tmp_path / "ckpt")
    pushes: list[list] = []

    _write_raw_batch(spark, raw_dir, BATCH1)
    q = run_ingest_stream(spark, raw_dir, table, ckpt, push_fn=pushes.append)
    q.awaitTermination(120)

    out = spark.read.parquet(table)
    assert out.count() == 2  # bad row dropped
    assert {r["symbol"] for r in out.collect()} == {"btc", "eth"}
    # snapshot push happened, ordered desc by cap
    assert len(pushes) == 1
    assert [r["symbol"] for r in pushes[-1]] == ["btc", "eth"]

    # second poll: restart from checkpoint picks up only the new file
    _write_raw_batch(spark, raw_dir, BATCH2)
    q = run_ingest_stream(spark, raw_dir, table, ckpt, push_fn=pushes.append)
    q.awaitTermination(120)

    out = spark.read.parquet(table)
    assert out.count() == 4
    snap = {r["symbol"]: r for r in pushes[-1]}
    assert snap["btc"]["current_price"] == 110.0  # latest wins
    assert set(snap) == {"btc", "eth", "sol"}     # eth stale but present


def test_batch_constant_timestamp_within_batch(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    table = str(tmp_path / "prices")
    _write_raw_batch(spark, raw_dir, BATCH1)
    q = run_ingest_stream(spark, raw_dir, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    stamps = {r["timestamp"] for r in spark.read.parquet(table).collect()}
    assert len(stamps) == 1  # P5: one timestamp per micro-batch


def test_failed_push_does_not_kill_stream(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    table = str(tmp_path / "prices")

    def exploding_push(rows):
        raise RuntimeError("sink down")

    _write_raw_batch(spark, raw_dir, BATCH1)
    q = run_ingest_stream(spark, raw_dir, table, str(tmp_path / "ckpt"), push_fn=exploding_push)
    q.awaitTermination(120)
    assert q.exception() is None  # batch isolated, stream alive
    # The append ran before the push failed (at-most-once per batch,
    # reference parity T7)
    assert spark.read.parquet(table).count() == 2


def test_stateful_snapshot_stream(spark, tmp_path):
    """Pure-streaming J1: stateful max_by in complete mode over a
    file stream of prices rows."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.pipeline import (
        streaming_snapshot_query,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.schema import PRICES_SCHEMA
    import datetime as dt

    pdir = str(tmp_path / "prices_stream")
    rows1 = [
        ("btc", "Bitcoin", 100.0, 1e9, 1e6, dt.datetime(2024, 1, 1, 0, 0)),
        ("eth", "Ethereum", 50.0, 5e8, 1e5, dt.datetime(2024, 1, 1, 0, 0)),
    ]
    rows2 = [("btc", "Bitcoin", 120.0, 1.2e9, 1e6, dt.datetime(2024, 1, 2, 0, 0))]
    spark.createDataFrame(rows1, PRICES_SCHEMA).write.mode("append").parquet(pdir)
    stream = spark.readStream.schema(PRICES_SCHEMA).parquet(pdir)
    q = streaming_snapshot_query(spark, stream, query_name="snap_test")
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, PRICES_SCHEMA).write.mode("append").parquet(pdir)
        q.processAllAvailable()
        snap = {r["symbol"]: r for r in spark.sql("SELECT * FROM snap_test").collect()}
        assert snap["btc"]["current_price"] == 120.0
        assert snap["eth"]["current_price"] == 50.0
    finally:
        q.stop()
