"""Custom stateful streaming operator: per-session entry/exit event
types with ``applyInPandasWithState`` — the streaming twin of the
batch ``events_entry_exit`` query (queries/behavior.py), for live
landing-page/exit-page reporting where sessions must close
incrementally instead of via a global window scan.

Same state model as ``streaming/sessionize.py`` (one OPEN session per
user, gap-based close), extended with the entry/exit bookkeeping: the
state carries the (ts, event_id) extremes AND their event types, so
every closed session reports which type opened it and which closed
it.  Ties on a shared timestamp are broken by ``event_id`` in BOTH
directions — identical to the batch twin's two ``row_number`` orders
— and rows are sorted by (ts, event_id) inside the fold, so arrival
order within a micro-batch never changes a verdict (the round-7
abandonment lesson: Spark does not guarantee row order into
``applyInPandasWithState``).

Out-of-order limits mirror sessionize: an event within the gap on
either side of the open interval merges (updating the entry/exit
extremes as needed); an event more than a gap EARLIER than the open
session's start is emitted immediately as a closed singleton (entry
== exit).  Use the batch operator for exact sessionization of
at-rest data.

Scale shape: state is hash-partitioned by user_id in the state store
— O(active users) entries of 4 longs + 2 short strings; each
micro-batch shuffles only its own rows.  Arrow batches in/out.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
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
        StructField("entry_type", StringType()),
        StructField("exit_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("start_eid", LongType()),
        StructField("end_us", LongType()),
        StructField("end_eid", LongType()),
        StructField("n_events", LongType()),
        StructField("entry_type", StringType()),
        StructField("exit_type", StringType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, sessions: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [
                pd.Timestamp(s[0], unit="us") for s in sessions
            ],
            "session_end": [pd.Timestamp(s[2], unit="us") for s in sessions],
            "n_events": [s[4] for s in sessions],
            "entry_type": [s[5] for s in sessions],
            "exit_type": [s[6] for s in sessions],
        }
    )


def make_entry_exit_fn(gap_seconds: int = 1800, timeout_ms: int | None = None):
    gap_us = gap_seconds * _US

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            open_s = tuple(state.get)
            state.remove()
            yield _emit(user_id, [open_s])
            return
        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            for t, eid, et in zip(ts, pdf["event_id"], pdf["event_type"]):
                # pd.isna on every column (the r7 advice lesson): a
                # NULL in any of them would poison the fold
                if pd.isna(t) or pd.isna(eid) or pd.isna(et):
                    continue
                rows.append((int(t.value // 1_000), int(eid), str(et)))
        # (ts, event_id) total order — bit-identical to the batch
        # twin's ORDER BY ts, event_id regardless of arrival order
        rows.sort(key=lambda r: (r[0], r[1]))
        open_s = tuple(state.get) if state.exists else None
        closed: list = []
        for t_us, eid, et in rows:
            if open_s is None:
                open_s = (t_us, eid, t_us, eid, 1, et, et)
            elif t_us - open_s[2] > gap_us:
                closed.append(open_s)
                open_s = (t_us, eid, t_us, eid, 1, et, et)
            elif open_s[0] - t_us > gap_us:
                # late event before the open session by more than the
                # gap: a separate earlier singleton session (see the
                # sessionize state-model note)
                closed.append((t_us, eid, t_us, eid, 1, et, et))
            else:
                s_us, s_eid, e_us, e_eid, n, ent, ext = open_s
                if (t_us, eid) < (s_us, s_eid):
                    s_us, s_eid, ent = t_us, eid, et
                if (t_us, eid) > (e_us, e_eid):
                    e_us, e_eid, ext = t_us, eid, et
                open_s = (s_us, s_eid, e_us, e_eid, n + 1, ent, ext)
        if open_s is not None:
            state.update(open_s)
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if closed:
            yield _emit(user_id, closed)

    return fold


def streaming_entry_exit(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events stream (user_id, ts, event_id, event_type, ...) ->
    stream of CLOSED sessions with entry/exit event types.

    Sessions still open stay in state until a later event closes them
    or — when ``timeout_ms`` is set — the processing-time timeout
    flushes them (same trigger caveat as streaming_sessionize: leave
    it unset for drain-style runs)."""
    return (
        events_stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_entry_exit_fn(gap_seconds, timeout_ms),
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
