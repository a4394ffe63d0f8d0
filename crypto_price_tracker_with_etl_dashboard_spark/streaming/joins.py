"""Streaming dedup and stream-stream joins — the delivery-semantics
toolkit around the ingest pipeline.

The reference is at-most-once (a failed poll just skips,
etl/crypto_etl.py:47-52) and its frontend deduplicates re-broadcast
rows client-side with a Map keyed on symbol
(frontend/src/App.js:182-186).  In Spark the same concerns live in
the engine: watermark-scoped dedup absorbs at-least-once redelivery,
and a time-interval stream-stream join correlates two live streams
with bounded state — both impossible in the reference without a
database round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-delivered rows: rows with the same ``keys`` arriving
    within the watermark window are emitted once.  State is bounded —
    seen-keys older than the watermark are evicted, so memory is
    O(arrival rate x watermark), independent of stream lifetime.
    This upgrades an at-least-once source (foreachBatch retries,
    kafka redelivery) to effectively-once for downstream aggregates.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    left_watermark: str = "10 minutes",
    right_watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream inner join: each left row matches right rows with
    ``right_ts`` in [left_ts - lookback, left_ts], same ``on`` key.

    Both sides are watermarked so the join state is bounded: a
    buffered right row can be evicted once the left watermark passes
    its ``right_ts + lookback`` (Spark derives this from the interval
    condition).  The right watermark must cover the lookback plus the
    left delay, hence the larger default.  At 100 TB-rates this is the
    operator that replaces "re-query the database per tick": state is
    O(rate x window) per key-partition, shuffled once on the key.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, "inner").drop(r[on])


def dedup_documents_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the batch ``exact_dedup``
    (functions/dedup.py): a training pipeline ingesting documents
    CONTINUOUSLY dedups on the same 128-bit normalized-content
    fingerprint the batch path groups on, emitting each distinct
    content's FIRST arrival and dropping re-arrivals whose event time
    falls within the watermark.

    Equivalence contract (pinned in tests/test_streaming.py): when
    arrivals are id-ordered, the emitted rows are exactly the batch
    ``exact_dedup`` keepers over the same data.  State is bounded —
    seen fingerprints older than the watermark are evicted, so memory
    is O(arrival rate x watermark) regardless of corpus size, and the
    fingerprint (16 bytes) is the ONLY per-row state kept, never the
    document text."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        fingerprint,
    )

    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
