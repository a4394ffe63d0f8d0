"""Streaming rate alerts: the watermarked twin of the batch
sliding-window burst detector (queries/behavior.py::
events_burst_detect).

Exact per-event sliding windows need per-key ordered state; the
standard streaming compromise — the same one every metrics pipeline
makes — is a HOPPING window (length ``window``, stride ``slide``):
each event lands in window/slide overlapping buckets, counts
aggregate incrementally per bucket, and a bucket crossing
``threshold`` emits an alert when the watermark closes it.  The
hopping grid quantizes burst boundaries by at most ``slide`` — the
batch operator is the exact-forensics twin to run AFTER an alert
fires.

Scale: state is O(keys x open windows), bounded by the watermark;
counts are map-side combinable partial aggregates, so the shuffle
carries partials, not events.  Append mode -> each alert emitted
exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def burst_alerts(
    events: DataFrame,
    threshold: int,
    key: str = "user_id",
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(key, window_start, window_end, n_events) for every hopping
    window whose count reaches ``threshold``.  Works identically on
    a stream (watermarked, incremental, append-mode emits once per
    closed window) and on a batch DataFrame (the test oracle runs
    the same function over a static frame)."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.col(key),
            F.window(ts_col, window, slide).alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            key,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def streaming_freshness(events: DataFrame, key: str = "event_type",
                        ts_col: str = "ts") -> DataFrame:
    """Streaming twin of the batch freshness monitor
    (queries/behavior.py::q_events_freshness_report's per-type leg):
    the live ``max(ts) per key`` table, maintained as a bounded
    (|keys| rows FOREVER) watermark-free aggregate.  ``last_ts`` has
    the streaming_hll discipline: max is associative, commutative and
    IDEMPOTENT, so it equals the batch aggregate over everything
    ingested regardless of micro-batch boundaries or at-least-once
    replays.  ``n_events`` is a COUNT — linear (any split/permutation
    merges exactly) but NOT idempotent: a replayed batch double-counts
    it, so treat it as a volume indicator under exactly-once delivery
    (foreachBatch + idempotent sink), not a replay-proof invariant —
    the distinction the freshness property test pins.  Staleness vs
    the stream head is a per-read join the consumer does on the tiny
    snapshot (the head is itself just the max of this table)."""
    df = events
    return df.groupBy(key).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
    )
