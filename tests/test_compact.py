"""Small-file compaction: many tiny per-batch appends collapse to
~target-sized files per date partition with identical data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.compact import (
    compact_parquet,
    plan_file_count,
)


def test_plan_file_count():
    mb = 1024 * 1024
    assert plan_file_count(0, 128 * mb) == 1
    assert plan_file_count(1, 128 * mb) == 1
    assert plan_file_count(128 * mb, 128 * mb) == 1
    assert plan_file_count(128 * mb + 1, 128 * mb) == 2
    assert plan_file_count(10 * 128 * mb, 128 * mb) == 10


def test_compact_partitioned_appends(spark, tmp_path):
    src = str(tmp_path / "prices")
    dst = str(tmp_path / "prices_compact")
    # simulate 12 micro-batch appends across 2 date partitions
    for batch in range(12):
        day = dt.date(2026, 1, 1 + batch % 2)
        df = spark.createDataFrame(
            [(f"c{i}", 1.0 * batch + i, day) for i in range(100)],
            ["symbol", "current_price", "dt"],
        )
        df.coalesce(1).write.mode("append").partitionBy("dt").parquet(src)

    stats = compact_parquet(spark, src, dst, target_file_bytes=128 * 1024 * 1024)
    assert stats["files_before"] >= 12
    assert stats["files_after"] == 2  # one file per date partition

    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert after.count() == before.count() == 1200
    # identical content, partition column preserved via directory layout
    key = [F.col("dt").cast("string"), "symbol", "current_price"]
    assert (
        before.select(*key).exceptAll(after.select(*key)).count() == 0
        and after.select(*key).exceptAll(before.select(*key)).count() == 0
    )
