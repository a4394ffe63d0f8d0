"""Shuffled-arrival / arbitrary-split property tests for the
streaming sessionize twin (r8 verdict ask #6; one file per twin — the
model is tests/test_streaming_entry_exit.py): hypothesis draws a
global event sequence, arbitrary micro-batch cut points, and a
per-batch arrival permutation; the stateful kernel folded over those
batches must reproduce the sequential batch-twin reference exactly.
Cross-batch order follows the operator's documented contract
(batches are cuts of the time-ordered stream); the property pinned
is that WITHIN a batch, arrival order and split placement never
matter.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st


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


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def _reference_sessions(ts_list, gap=1800):
    """Sequential reference: order timestamps, split on gap, return
    [(start_s, end_s, n_events)] — the batch events_sessionize rule."""
    sessions = []
    for t in sorted(ts_list):
        if not sessions or t - sessions[-1][1] > gap:
            sessions.append([t, t, 1])
        else:
            s = sessions[-1]
            s[1], s[2] = t, s[2] + 1
    return [tuple(s) for s in sessions]


_ts_lists = st.lists(
    st.integers(min_value=0, max_value=7200), min_size=0, max_size=30
)


@settings(max_examples=200, deadline=None)
@given(
    ts=_ts_lists,
    splits=st.lists(st.integers(0, 30), max_size=4),
    seed=st.randoms(use_true_random=False),
)
def test_sessionize_fold_matches_reference_under_any_split(ts, splits, seed):
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.sessionize import (
        make_sessionize_fn,
    )

    ordered = sorted(ts)
    cuts = sorted({min(s, len(ordered)) for s in splits} | {0, len(ordered)})
    batches = [ordered[a:b] for a, b in zip(cuts, cuts[1:])]

    fold = make_sessionize_fn(gap_seconds=1800)
    state = _FakeState()
    emitted = []

    def _drain(out_iter):
        for out in out_iter:
            emitted.extend(
                (
                    int(r.session_start.timestamp()),
                    int(r.session_end.timestamp()),
                    r.n_events,
                )
                for r in out.itertuples()
            )

    for b in batches:
        b = list(b)
        seed.shuffle(b)  # arrival order inside a batch must not matter
        pdf = pd.DataFrame({"ts": [pd.Timestamp(t, unit="s") for t in b]})
        _drain(fold((7,), iter([pdf]), state))
    if state.exists:
        state.hasTimedOut = True
        _drain(fold((7,), iter([]), state))

    assert sorted(emitted) == sorted(_reference_sessions(ordered))


@settings(max_examples=100, deadline=None)
@given(
    ts=_ts_lists,
    seed=st.randoms(use_true_random=False),
)
def test_sessionize_single_batch_is_order_invariant(ts, seed):
    """Degenerate split (everything in one micro-batch, any arrival
    order) must equal the batch rule exactly — the pure shuffle
    axis, with no cross-batch contract in play."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.sessionize import (
        make_sessionize_fn,
    )

    fold = make_sessionize_fn(gap_seconds=1800)
    state = _FakeState()
    b = list(ts)
    seed.shuffle(b)
    emitted = []
    pdf = pd.DataFrame({"ts": [pd.Timestamp(t, unit="s") for t in b]})
    for out in fold((7,), iter([pdf]), state):
        emitted.extend(
            (
                int(r.session_start.timestamp()),
                int(r.session_end.timestamp()),
                r.n_events,
            )
            for r in out.itertuples()
        )
    if state.exists:
        state.hasTimedOut = True
        for out in fold((7,), iter([]), state):
            emitted.extend(
                (
                    int(r.session_start.timestamp()),
                    int(r.session_end.timestamp()),
                    r.n_events,
                )
                for r in out.itertuples()
            )
    assert sorted(emitted) == sorted(_reference_sessions(ts))


