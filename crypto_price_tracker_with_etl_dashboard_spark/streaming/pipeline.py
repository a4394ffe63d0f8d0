"""Structured Streaming ETL pipeline (SURVEY.md section 2.8, section
3.1): the reference's poll -> validate -> append -> re-query ->
broadcast loop (etl/crypto_etl.py:138-157 + api/server.js:166-193)
becomes ONE streaming query:

    raw micro-batch --foreachBatch--> validate/normalize
                                   -> append to prices table
                                   -> recompute latest snapshot
                                   -> push_fn(snapshot rows)

Delivery semantics: the reference is at-most-once (a failed fetch or
insert skips the batch and keeps looping, etl/crypto_etl.py:47-52,
120-123).  foreachBatch + checkpointing gives at-least-once replay;
the table writes are made IDEMPOTENT (dynamic partition overwrite
keyed by batch/tick — a replayed batch replaces its own previous
output), so table contents are exactly-once, and the snapshot push
is idempotent by construction (full-state broadcast) — strictly
stronger than the reference end to end.  Cancellation exceptions
propagate out of the batch body (``_is_cancellation``); swallowing
them under the T7 catch-all would mark an interrupted batch
committed and silently DROP its tick on restart.

For tests the source is a file stream over a directory of parquet
batch files (each file = one poll result); in production the same
pipeline runs off any streaming source (kafka/rate/custom) — only
``raw_stream`` changes.
"""

from __future__ import annotations

import datetime as dt
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from crypto_price_tracker_with_etl_dashboard_spark.schema import COINGECKO_RAW_SCHEMA
from crypto_price_tracker_with_etl_dashboard_spark.sources.ingest import validate_and_normalize
from crypto_price_tracker_with_etl_dashboard_spark.operators.latest import latest_snapshot


def _is_cancellation(exc: Exception) -> bool:
    """True when the batch failed because the QUERY is stopping (job
    cancelled / context shut down), not because the data is bad.
    Cancellations must propagate: swallowing them reports the batch
    as successful, the offset log commits it, and the tick is LOST on
    restart (falsely-committed batch).  Only genuine data errors are
    isolated per the reference's T7 semantics."""
    msg = str(exc)
    return any(
        s in msg
        for s in (
            "cancelled",
            "Cancelled",
            "InterruptedException",
            "SparkContext was shut down",
            "Task was denied",
        )
    )


def snapshot_for_push(prices: DataFrame) -> DataFrame:
    """The latest-per-symbol snapshot the WebSocket tier re-broadcasts
    (api/server.js:167-185)."""
    return latest_snapshot(prices, tiebreaker="event_id", order_by_cap=True)


def run_ingest_stream(
    spark: SparkSession,
    raw_dir: str,
    table_path: str,
    checkpoint_dir: str,
    push_fn: Optional[Callable[[list], None]] = None,
    trigger_seconds: Optional[int] = None,
) -> StreamingQuery:
    """Start the ETL stream: watch ``raw_dir`` for new raw batch
    files, validate/normalize each micro-batch with a batch-constant
    timestamp, append to the partitioned prices table, then recompute
    and push the latest snapshot.

    A malformed batch must not kill the pipeline (reference behavior
    T7: rollback the batch, keep looping) — the foreachBatch body
    isolates per-batch failures.
    """
    raw_stream = (
        spark.readStream.schema(COINGECKO_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            batch_ts = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            clean = validate_and_normalize(batch_df, batch_ts)
            # Idempotent sink: foreachBatch is at-least-once, so a
            # replayed batch must REPLACE its own previous (possibly
            # partial) output, not append next to it.  Dynamic
            # partition overwrite keyed by batch_id rewrites exactly
            # the partitions this batch owns — exactly-once to the
            # table without a transaction log.
            (
                clean.withColumn("dt", F.to_date("timestamp"))
                .withColumn("batch", F.lit(batch_id))
                .withColumn("event_id", F.monotonically_increasing_id())
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("dt", "batch")
                .parquet(table_path)
            )
            if push_fn is not None:
                prices = spark.read.parquet(table_path)
                push_fn(snapshot_for_push(prices).collect())
        except Exception as exc:
            if _is_cancellation(exc):
                raise  # stopping query: let Spark leave the batch uncommitted
            print(f"[ingest] batch {batch_id} failed, skipping: {exc}")  # T7

    writer = raw_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_snapshot_query(
    spark: SparkSession,
    prices_stream: DataFrame,
    query_name: str = "latest_snapshot_stream",
) -> StreamingQuery:
    """Pure-streaming alternative for the snapshot: stateful
    max_by aggregation in update mode over the prices stream —
    the J1 greatest-per-group as incremental state rather than a
    re-query.  Memory sink for tests; swap format for delivery."""
    agg = prices_stream.groupBy("symbol").agg(
        F.max_by(
            F.struct("name", "current_price", "market_cap", "total_volume", "timestamp"),
            "timestamp",
        ).alias("s")
    ).select("symbol", "s.*")
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def run_feed_stream(
    spark: SparkSession,
    table_path: str,
    checkpoint_dir: str,
    push_fn: Optional[Callable[[list], None]] = None,
    feed_options: Optional[dict] = None,
    trigger_seconds: Optional[int] = None,
) -> StreamingQuery:
    """The same ETL loop driven by the ``market_feed`` custom
    DataSource (sources/market_feed.py) instead of a file drop:
    poll tick -> validate/normalize -> append -> snapshot push.

    The batch timestamp derives from the tick number (epoch +
    tick x 5 min), not wall clock — deterministic replay across
    checkpoint recovery, preserving the reference's batch-constant
    timestamp tie semantics (etl/crypto_etl.py:82) under re-delivery
    too: a replayed tick re-writes IDENTICAL rows.
    """
    from crypto_price_tracker_with_etl_dashboard_spark.sources.market_feed import (
        MarketFeedDataSource,
    )

    spark.dataSource.register(MarketFeedDataSource)
    reader = spark.readStream.format("market_feed")
    for k, v in (feed_options or {}).items():
        reader = reader.option(k, v)
    feed = reader.load()

    epoch = dt.datetime(2024, 1, 1)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            ticks = [r["tick"] for r in batch_df.select("tick").distinct().collect()]
            for tick in sorted(ticks):
                batch_ts = epoch + dt.timedelta(seconds=300 * tick)
                clean = validate_and_normalize(
                    batch_df.filter(F.col("tick") == tick).select(
                        "symbol", "name", "current_price", "market_cap", "total_volume"
                    ),
                    batch_ts,
                )
                # Idempotent per-tick sink (see run_ingest_stream):
                # replaying a tick overwrites its own partition, so
                # at-least-once replay yields exactly-once contents.
                (
                    clean.withColumn("dt", F.to_date("timestamp"))
                    .withColumn("tick", F.lit(int(tick)))
                    .withColumn("event_id", F.monotonically_increasing_id())
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("dt", "tick")
                    .parquet(table_path)
                )
            if push_fn is not None:
                prices = spark.read.parquet(table_path)
                push_fn(snapshot_for_push(prices).collect())
        except Exception as exc:
            if _is_cancellation(exc):
                raise  # stopping query: let Spark leave the batch uncommitted
            print(f"[feed] batch {batch_id} failed, skipping: {exc}")  # T7

    writer = feed.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
