"""Shuffled-arrival / arbitrary-split property tests for the
streaming twins that predate the r7 abandonment lesson (r8 verdict
ask #6): ``sessionize``, ``EMA/MACD`` and the document-dedup stream.

The model is tests/test_streaming_entry_exit.py: hypothesis draws a
global event sequence, arbitrary micro-batch cut points, and a
per-batch arrival permutation; the stateful kernel folded over those
batches must reproduce the sequential batch-twin reference exactly.
Cross-batch order follows each operator's documented contract
(batches are cuts of the time-ordered stream — an EMA state cannot
be rewound; sessionize documents the same O(1)-state trade-off) —
the property being pinned is that WITHIN a batch, arrival order and
split placement never matter.
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


# ---------------------------------------------------------------------------
# document-dedup stream (end-to-end: the kernel is Spark's
# dropDuplicatesWithinWatermark; what's ours is the fingerprint and
# the exactly-one-keeper-per-content contract)
# ---------------------------------------------------------------------------

_doc_words = ["alpha", "beta", "GAMMA", "delta  epsilon"]


@settings(max_examples=8, deadline=None)
@given(
    picks=st.lists(
        st.integers(0, len(_doc_words) - 1), min_size=1, max_size=10
    ),
    splits=st.lists(st.integers(0, 10), max_size=2),
    seed=st.randoms(use_true_random=False),
)
def test_doc_dedup_stream_one_keeper_per_content_any_split(
    spark, tmp_path_factory, picks, splits, seed
):
    """Any micro-batch split, any arrival order: the dedup stream
    emits EXACTLY one row per distinct normalized content (no dup,
    no skip), and the emitted fingerprint set equals the batch
    exact_dedup's over the same rows."""
    import pyspark.sql.types as T

    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        exact_dedup,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.streaming import (
        dedup_documents_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, _doc_words[w], t0 + dt.timedelta(seconds=i))
        for i, w in enumerate(picks)
    ]
    cuts = sorted({min(s, len(rows)) for s in splits} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(cuts, cuts[1:])]

    base = tmp_path_factory.mktemp("dedup_prop")
    pdir = str(base / "docs")
    # the file source requires an existing path at stream definition
    spark.createDataFrame([], schema).write.mode("append").parquet(pdir)
    stream = spark.readStream.schema(schema).parquet(pdir)
    q = (
        dedup_documents_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("doc_dedup_prop")
        .start()
    )
    try:
        for b in batches:
            b = list(b)
            seed.shuffle(b)
            if not b:
                continue
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(pdir)
            q.processAllAvailable()
        got = spark.sql("SELECT doc_id, fp FROM doc_dedup_prop").collect()
    finally:
        q.stop()
        spark.catalog.dropTempView("doc_dedup_prop")

    batch_fps = {
        r["fp"]
        for r in exact_dedup(spark.createDataFrame(rows, schema)).collect()
    }
    got_fps = [r["fp"] for r in got]
    assert len(got_fps) == len(set(got_fps))  # no content emitted twice
    assert set(got_fps) == batch_fps  # no content skipped
