"""Tests for the streaming entry/exit session operator: end-to-end
through a real stream (parquet source -> applyInPandasWithState ->
memory sink) and kernel-level property equivalence with the batch
``events_entry_exit`` semantics under arbitrary micro-batch splits
and arrival orders."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def test_streaming_entry_exit_closes_on_gap(spark, tmp_path):
    """A later event beyond the gap closes the open session; the
    emitted row carries the session's entry and exit types, with a
    shared-timestamp tie broken by event_id."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.entry_exit import (
        streaming_entry_exit,
    )

    pdir = str(tmp_path / "events_stream")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch1 = [
        # user 1: tie at t0 — event_id 11 (view) must be the entry
        (1, t0, 12, "click"),
        (1, t0, 11, "view"),
        (1, t0 + dt.timedelta(minutes=10), 13, "purchase"),
        (2, t0, 20, "view"),
    ]
    spark.createDataFrame(batch1, _SCHEMA).coalesce(1).write.mode("append").parquet(pdir)
    stream = spark.readStream.schema(_SCHEMA).parquet(pdir)
    q = (
        streaming_entry_exit(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("entry_exit_test")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM entry_exit_test").count() == 0

        batch2 = [(1, t0 + dt.timedelta(hours=2), 14, "view")]  # closes user 1
        spark.createDataFrame(batch2, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pdir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM entry_exit_test").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["user_id"] == 1 and r["n_events"] == 3
        assert r["session_start"] == t0
        assert r["session_end"] == t0 + dt.timedelta(minutes=10)
        assert r["entry_type"] == "view"  # eid 11 beats eid 12 on the tie
        assert r["exit_type"] == "purchase"
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Kernel property: the fold across ANY micro-batch split + arrival
# order agrees with the sequential batch-twin reference
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def _reference_sessions(rows, gap=1800):
    """Sequential reference: order by (ts, eid), split on gap, return
    [(start_s, end_s, n, entry, exit)]."""
    seq = sorted(rows)
    sessions = []
    for t, eid, et in seq:
        if not sessions or t - sessions[-1][1] > gap:
            sessions.append([t, t, 1, et, et])
        else:
            s = sessions[-1]
            s[1], s[2], s[4] = t, s[2] + 1, et
    return [tuple(s) for s in sessions]


_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(
    rows=_rows,
    splits=st.lists(st.integers(0, 30), max_size=4),
    seed=st.randoms(use_true_random=False),
)
def test_entry_exit_fold_matches_reference_under_any_split(rows, splits, seed):
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.entry_exit import (
        make_entry_exit_fn,
    )

    # unique event ids in GLOBAL (ts-sorted) order — the operator's
    # cross-batch ordering contract (events arrive roughly in order;
    # within a batch, any arrival order)
    ordered = sorted((t, i, et) for i, (t, et) in enumerate(rows))
    ordered = [(t, eid, et) for eid, (t, _i, et) in enumerate(ordered)]

    cuts = sorted({min(s, len(ordered)) for s in splits} | {0, len(ordered)})
    batches = [ordered[a:b] for a, b in zip(cuts, cuts[1:])]

    fold = make_entry_exit_fn(gap_seconds=1800)
    state = _FakeState()
    emitted = []
    for b in batches:
        b = list(b)
        seed.shuffle(b)  # arrival order inside a batch must not matter
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(t, unit="s") for t, _e, _y in b],
                "event_id": [e for _t, e, _y in b],
                "event_type": [y for _t, _e, y in b],
            }
        )
        for out in fold((7,), iter([pdf]), state):
            emitted.extend(
                (
                    int(r.session_start.timestamp()),
                    int(r.session_end.timestamp()),
                    r.n_events,
                    r.entry_type,
                    r.exit_type,
                )
                for r in out.itertuples()
            )
    # flush the final open session, if any
    if state.exists:
        state.hasTimedOut = True
        for out in fold((7,), iter([]), state):
            emitted.extend(
                (
                    int(r.session_start.timestamp()),
                    int(r.session_end.timestamp()),
                    r.n_events,
                    r.entry_type,
                    r.exit_type,
                )
                for r in out.itertuples()
            )

    want = _reference_sessions([(t, e, y) for t, e, y in ordered])
    assert sorted(emitted) == sorted(want)


def test_streaming_entry_exit_state_survives_restart(spark, tmp_path):
    """Stopping the stream and restarting from its checkpoint resumes
    the open-session state exactly: the session spanning the restart
    is emitted ONCE, with the entry recorded before the stop and the
    exit from after it — state neither reset nor replayed."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.entry_exit import (
        streaming_entry_exit,
    )

    pdir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions_out")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def start():
        # file sink, not memory: the memory sink rejects checkpoint
        # recovery, and the parquet sink's manifest proves no session
        # is duplicated or skipped across the restart
        stream = spark.readStream.schema(_SCHEMA).parquet(pdir)
        return (
            streaming_entry_exit(stream, gap_seconds=1800)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )

    batch1 = [
        (1, t0, 1, "view"),
        (1, t0 + dt.timedelta(minutes=5), 2, "click"),
    ]
    spark.createDataFrame(batch1, _SCHEMA).coalesce(1).write.mode("append").parquet(pdir)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch2 = [
        # within the gap of the checkpointed open session: extends it
        (1, t0 + dt.timedelta(minutes=20), 3, "purchase"),
        # beyond the gap: closes the restored session, opens a new one
        (1, t0 + dt.timedelta(hours=3), 4, "view"),
        # and a second gap-crossing event closes THAT one too
        (1, t0 + dt.timedelta(hours=6), 5, "click"),
    ]
    spark.createDataFrame(batch2, _SCHEMA).coalesce(1).write.mode("append").parquet(pdir)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r["session_start"]
    )
    assert [
        (r["n_events"], r["entry_type"], r["exit_type"]) for r in rows
    ] == [(3, "view", "purchase"), (1, "view", "view")]
    assert rows[0]["session_start"] == t0
    assert rows[0]["session_end"] == t0 + dt.timedelta(minutes=20)
