"""Shuffled-arrival / arbitrary-split property tests for the
streaming abandonment twin (completing the per-twin matrix the r8/r9
verdicts asked for; model: tests/test_streaming_ema_properties.py):
hypothesis draws a per-user event sequence (views / purchases /
unrelated clicks at strictly increasing times — the twin's
cross-batch no-regress contract; ties are the batch operator's
certified territory), arbitrary micro-batch cut points, and a
per-batch arrival permutation.  The kernel folded over those batches
must emit exactly the verdicts of the documented forward-window
semantics — a view CONVERTS iff a purchase strictly after it has
purchase_ts <= view_ts + window, is ABANDONED once any later event
passes the window, and stays PENDING (no row) otherwise — and a
processing-time timeout flush must emit exactly the pending set as
abandoned and drop the state."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

_WINDOW_MIN = 60
_WINDOW_US = _WINDOW_MIN * 60 * 1_000_000
_T0_US = 1_700_000_000_000_000  # fixed epoch anchor, micros


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

    def setTimeoutDuration(self, ms):  # pragma: no cover - interface shim
        pass


def _reference(events):
    """(eid -> converted) for RESOLVED views; unresolved views absent.
    ``events`` = [(t_us, event_type, eid)] in strict time order."""
    out = {}
    for i, (t, et, _eid) in enumerate(events):
        if et != "view":
            continue
        for t2, et2, _e2 in events[i + 1 :]:
            if t2 > t + _WINDOW_US:
                out[_eid] = False
                break
            if et2 == "purchase":
                out[_eid] = True
                break
    return out


def _fold_batches(batches, state):
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.abandonment import (
        make_abandonment_fn,
    )

    fold = make_abandonment_fn(window_min=_WINDOW_MIN, flush_timeout_min=5)
    emitted = {}
    for b in batches:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(t * 1000) for t, _et, _e in b],
                "event_type": [et for _t, et, _e in b],
                "event_id": [e for _t, _et, e in b],
            }
        )
        for out in fold((7,), iter([pdf]), state):
            for r in out.itertuples():
                assert r.event_id not in emitted  # exactly-once per view
                emitted[r.event_id] = bool(r.converted)
    return fold, emitted


@settings(max_examples=150, deadline=None)
@given(
    steps=st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase", "click"]),
            st.integers(1, 90),  # strictly positive minute gaps
        ),
        min_size=0,
        max_size=25,
    ),
    splits=st.lists(st.integers(0, 25), max_size=4),
    seed=st.randoms(use_true_random=False),
)
def test_abandonment_fold_matches_forward_window_reference(
    steps, splits, seed
):
    t = _T0_US
    events = []
    for i, (et, gap) in enumerate(steps):
        t += gap * 60 * 1_000_000
        events.append((t, et, i))

    cuts = sorted({min(s, len(events)) for s in splits} | {0, len(events)})
    batches = []
    for a, b in zip(cuts, cuts[1:]):
        batch = list(events[a:b])
        seed.shuffle(batch)  # within-batch arrival order is free
        batches.append(batch)

    state = _FakeState()
    fold, emitted = _fold_batches(batches, state)

    want = _reference(events)
    assert emitted == want

    # pending views = every view the reference left unresolved; the
    # state holds them in event order
    pending_want = [
        e for t_us, et, e in events if et == "view" and e not in want
    ]
    if pending_want:
        assert state.exists
        assert list(state.get[1]) == pending_want
    # the processing-time flush emits exactly the pending set as
    # abandoned and drops the state (exactly-once: nothing re-emits)
    state.hasTimedOut = True
    flushed = {}
    for out in fold((7,), iter([]), state):
        for r in out.itertuples():
            flushed[r.event_id] = bool(r.converted)
    assert flushed == {e: False for e in pending_want}
    assert not state.exists
