"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the streaming twin of the batch
``events_sessionize`` query (queries/relational.py), for workloads
where sessions must close incrementally instead of via a global
window scan.

State model (per user): the one OPEN session ``(start_s, end_s,
n_events)`` as epoch seconds.  Each micro-batch folds its events into
the open session in timestamp order; an event more than
``gap_seconds`` after the open session's end CLOSES it (the closed
session is emitted downstream) and opens a new one.  A processing-time
timeout flushes sessions for users that stop sending events.

Out-of-order limits: an event within ``gap_seconds`` of the open
interval on EITHER side merges (extending ``session_start``
backwards when needed); an event more than a gap EARLIER than the
open session's start is emitted immediately as a closed singleton
session.  That matches the batch twin whenever disorder stays within
one gap; events arriving even later that would bridge the singleton
to other events cannot revise the already-emitted row — single-
interval state trades that tail case for O(1) state per user.  Use
the batch operator (queries/relational.py::events_sessionize) for
exact sessionization of at-rest data.

Scale shape: state is hash-partitioned by user_id in the state store
— O(active users) entries of 3 longs each; each micro-batch shuffles
only its own rows.  Arrow batches in/out, pandas per group.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _emit(user_id: int, sessions: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="s") for s, _e, _n in sessions],
            "session_end": [pd.Timestamp(e, unit="s") for _s, e, _n in sessions],
            "n_events": [n for _s, _e, n in sessions],
        }
    )


def make_sessionize_fn(gap_seconds: int = 1800, timeout_ms: int | None = None):
    def sessionize(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield _emit(user_id, [(s, e, n)])
            return
        # pd.notna: a NULL ts becomes NaT, whose .timestamp() raises
        # and would kill the whole streaming query over one malformed
        # row — drop it, like the batch twin's gap-isNull tolerance.
        ts = sorted(
            int(t.timestamp())
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
            if pd.notna(t)
        )
        open_s = state.get if state.exists else None
        closed: list = []
        for t in ts:
            if open_s is None:
                open_s = (t, t, 1)
            elif t - open_s[1] > gap_seconds:
                closed.append(open_s)
                open_s = (t, t, 1)
            elif open_s[0] - t > gap_seconds:
                # late cross-batch event BEFORE the open session by
                # more than the gap: a separate, earlier session —
                # folding it in (the old behavior) merged sessions the
                # batch twin splits and never moved session_start.
                # With single-interval state it is emitted immediately
                # as a singleton (see the state-model note in the
                # module docstring).
                closed.append((t, t, 1))
            else:
                # within the gap of the open interval on either side:
                # extend start backwards too, so a late event just
                # before the session keeps session_start truthful
                open_s = (
                    min(open_s[0], t), max(open_s[1], t), open_s[2] + 1
                )
        if open_s is not None:
            state.update(open_s)
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if closed:
            yield _emit(user_id, closed)

    return sessionize


def streaming_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events stream (user_id, ts, ...) -> stream of CLOSED sessions.

    Sessions still open stay in state until a later event closes them
    or — when ``timeout_ms`` is set — the processing-time timeout
    flushes them.  Note: a processing-time timeout makes the engine
    schedule micro-batches continuously to fire expirations, so leave
    it unset for drain-style (availableNow / processAllAvailable)
    runs and set it for long-lived production queries."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionize_fn(gap_seconds, timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
