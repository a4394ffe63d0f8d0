"""Shuffled-arrival / arbitrary-split property tests for the
streaming EMA/MACD twin (r8 verdict ask #6; one file per twin — the
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

import datetime as dt
import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import SCALE


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
# EMA / MACD
# ---------------------------------------------------------------------------


def _reference_ema(prices, fast=12, slow=26):
    """Sequential reference: the exact integer recursion of
    operators/indicators.py::ema_macd over in-order prices."""
    hf, hs = (fast + 1) // 2, (slow + 1) // 2
    ef = es = rn = 0
    out = []
    for p in prices:
        xu = int(math.floor(p * SCALE + 0.5))
        if rn == 0:
            ef = es = xu
        else:
            ef = (2 * xu + (fast - 1) * ef + hf) // (fast + 1)
            es = (2 * xu + (slow - 1) * es + hs) // (slow + 1)
        rn += 1
        out.append((rn, ef, es, ef - es))
    return out


@settings(max_examples=200, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=1, max_value=10_000_000),
        min_size=0,
        max_size=30,
    ),
    splits=st.lists(st.integers(0, 30), max_size=4),
    seed=st.randoms(use_true_random=False),
)
def test_ema_fold_matches_reference_under_any_split(cents, splits, seed):
    """Unique, increasing event times (the fixed-point recursion has
    no tie rule to exercise — ties follow arrival order by contract);
    any micro-batch cut of the ordered stream, any arrival order
    inside a batch: the emitted fixed-point EMAs must equal the batch
    operator's sequential recursion bit-for-bit."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.indicators import (
        make_ema_fn,
    )

    t0 = dt.datetime(2024, 1, 1)
    prices = [c / 100.0 for c in cents]
    ordered = [
        (t0 + dt.timedelta(seconds=i), p) for i, p in enumerate(prices)
    ]
    cuts = sorted({min(s, len(ordered)) for s in splits} | {0, len(ordered)})
    batches = [ordered[a:b] for a, b in zip(cuts, cuts[1:])]

    fold = make_ema_fn()
    state = _FakeState()
    emitted = []
    for b in batches:
        b = list(b)
        seed.shuffle(b)
        pdf = pd.DataFrame(
            {"ts": [t for t, _p in b], "price": [p for _t, p in b]}
        )
        for out in fold(("btc",), iter([pdf]), state):
            emitted.extend(
                (
                    r.rn,
                    int(math.floor(r.ema_fast * SCALE + 0.5)),
                    int(math.floor(r.ema_slow * SCALE + 0.5)),
                )
                for r in out.itertuples()
            )

    want = [(rn, ef, es) for rn, ef, es, _m in _reference_ema(prices)]
    assert emitted == want
    # the state after the full stream equals the reference's tail
    if prices:
        ef, es, rn = state.get
        assert (rn, ef, es) == (
            want[-1][0],
            want[-1][1],
            want[-1][2],
        )


