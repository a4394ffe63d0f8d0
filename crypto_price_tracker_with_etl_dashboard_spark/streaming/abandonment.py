"""Streaming view-to-purchase abandonment: the stateful streaming
twin of the batch ``queries/behavior.py::q_events_abandonment``
(certified as the ``events_abandonment`` oracle row), via
``applyInPandasWithState`` — the ema_macd/sessionize pattern: the
batch operator defines the semantics, the stream resolves each view
incrementally and emits one verdict row per view.

Semantics (identical to the batch forward-window): a view CONVERTS
iff a purchase by the same user occurs strictly after it (event
order) with ``purchase_ts <= view_ts + window``; otherwise it is
ABANDONED.  The streaming resolution rule follows from in-order
delivery:

- any event at time T first EXPIRES every pending view with
  ``view_ts + window < T`` (no purchase can ever qualify for them —
  later events only have later timestamps) → emit abandoned;
- a purchase then converts EVERY remaining pending view (pending and
  not expired means ``view_ts + window >= purchase_ts``, which is
  exactly the qualification test) → emit converted;
- a view appends itself to the pending list.

State model (per user): the pending views as two parallel arrays
(event-time micros, event ids) — bounded by the view rate within ONE
window, the same bound a watermark would enforce; everything older
is resolved and gone.  Ordering contract (same as the EMA twin):
within a micro-batch any arrival order is fine (rows sort by event
time, ties by event_id — the batch window's ORDER BY ts, event_id,
so tie handling is deterministic and bit-identical to the oracle);
across micro-batches events must not regress.  A view whose window
is still open when the stream idles stays pending until the next
event arrives — unless ``flush_timeout_min`` is set, which arms a
PROCESSING-TIME timeout per user: after that much idle wall time the
remaining pending views are emitted as abandoned and the state
dropped.  The flush uses processing time as the event-time proxy a
live feed justifies (no event in T minutes ≈ no purchase will
qualify); on historical replay it can abandon a view whose purchase
arrives later than T behind, so the batch operator over at-rest data
stays the replay-safe source of truth.

Scale shape: state is hash-partitioned by user in the state store;
each micro-batch shuffles only its own rows; output is append-mode,
exactly one row per view ever.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

ABANDON_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("converted", BooleanType()),
    ]
)

ABANDON_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("eids", ArrayType(LongType())),
    ]
)


def make_abandonment_fn(
    window_min: int = 60, flush_timeout_min: float | None = None
):
    if window_min <= 0:
        raise ValueError(f"window_min must be positive, got {window_min}")
    if flush_timeout_min is not None and flush_timeout_min <= 0:
        raise ValueError(
            f"flush_timeout_min must be positive, got {flush_timeout_min}"
        )
    window_us = window_min * 60 * 1_000_000

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # bounded-latency flush: the stream sat idle past the
            # processing-time deadline, so every still-pending view is
            # declared abandoned (exactly-once holds: the state is
            # dropped, so a later purchase finds nothing to convert).
            ts_us, eids = state.get if state.exists else ([], [])
            state.remove()
            if eids:
                yield pd.DataFrame(
                    {
                        "user_id": [user] * len(eids),
                        "view_ts": [pd.Timestamp(t * 1000) for t in ts_us],
                        "event_id": list(eids),
                        "converted": [False] * len(eids),
                    }
                )
            return
        rows = []
        for pdf in pdfs:
            for i_row in range(len(pdf)):
                t = pdf["ts"].iloc[i_row]
                et = pdf["event_type"].iloc[i_row]
                eid = pdf["event_id"].iloc[i_row]
                if pd.isna(t) or pd.isna(et) or pd.isna(eid):
                    continue
                # pandas Timestamp .value is ns since epoch
                rows.append((t.value // 1000, str(et), int(eid)))
        if not rows:
            return
        # (ts, event_id) — the batch twin's ORDER BY, so timestamp
        # ties resolve identically regardless of physical arrival
        # order inside the micro-batch (Spark guarantees none).
        rows.sort(key=lambda r: (r[0], r[2]))
        if state.exists:
            ts_us, eids = state.get
            pending = list(zip(list(ts_us), list(eids)))
        else:
            pending = []
        out_ts, out_eid, out_conv = [], [], []

        def resolve(upto_idx: int, converted: bool) -> None:
            for v_ts, v_eid in pending[:upto_idx]:
                out_ts.append(pd.Timestamp(v_ts * 1000))
                out_eid.append(v_eid)
                out_conv.append(converted)
            del pending[:upto_idx]

        for t_us, et, eid in rows:
            # expire views whose window closed before this event
            n_exp = 0
            while n_exp < len(pending) and pending[n_exp][0] + window_us < t_us:
                n_exp += 1
            resolve(n_exp, False)
            if et == "purchase":
                resolve(len(pending), True)
            elif et == "view":
                pending.append((t_us, eid))
        if flush_timeout_min is not None and not pending:
            # nothing left to flush — drop the state so no timeout
            # invocation fires for this user
            if state.exists:
                state.remove()
        else:
            state.update(([p[0] for p in pending], [p[1] for p in pending]))
            if flush_timeout_min is not None:
                # ProcessingTimeTimeout deadlines do not persist across
                # invocations: re-arm on every call that leaves state
                state.setTimeoutDuration(int(flush_timeout_min * 60 * 1000))
        if out_eid:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(out_eid),
                    "view_ts": out_ts,
                    "event_id": out_eid,
                    "converted": out_conv,
                }
            )

    return fold


def streaming_abandonment(
    events_stream: DataFrame,
    window_min: int = 60,
    flush_timeout_min: float | None = None,
) -> DataFrame:
    """events stream (user_id, ts, event_id, event_type) ->
    append-mode stream of per-view conversion verdicts.

    ``flush_timeout_min`` (optional) bounds emission latency: a user
    whose stream goes idle for that much PROCESSING time has their
    pending views flushed as abandoned (see module docstring for the
    replay caveat)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.NoTimeout
        if flush_timeout_min is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events_stream.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("ts"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("event_type").cast("string").alias("event_type"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            make_abandonment_fn(window_min, flush_timeout_min),
            outputStructType=ABANDON_SCHEMA,
            stateStructType=ABANDON_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
