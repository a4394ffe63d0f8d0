"""Shuffled-arrival / arbitrary-split property tests for the
streaming VWAP twin (r9 verdict ask #6; one file per twin — the
model is tests/test_streaming_ema_properties.py): hypothesis draws a
price stream, an ARBITRARY partition of its rows into micro-batches
(event-time windows don't care about arrival order at all, so unlike
the EMA twin even cross-batch order is free), and the per-batch
DECIMAL(38,0) window partials emitted by the real operator must
max/sum-merge to exactly the one-shot batch aggregate — the property
that makes Structured Streaming's incremental state accumulation
bit-identical to the certified batch query."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.streaming.windows import (
    vwap_windows,
)

_SCHEMA = "symbol string, current_price double, total_volume double, timestamp timestamp"
_T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (
                "ab"[s],
                c / 100.0,
                float(v),
                _T0 + dt.timedelta(minutes=m),
            )
            for s, c, v, m in rows
        ],
        _SCHEMA,
    )


def _partials(df):
    out = {}
    for r in vwap_windows(df, window="1 hour", partials=True).collect():
        out[(r.symbol, r.window_start)] = (
            r.n_ticks,
            int(r.pv),
            int(r.v),
        )
    return out


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),          # symbol
            st.integers(1, 1_000_000),  # price cents
            st.integers(0, 1_000),      # volume (0 exercises the filter)
            st.integers(0, 179),        # minute within 3 one-hour windows
        ),
        min_size=0,
        max_size=24,
    ),
    splits=st.lists(st.integers(0, 24), max_size=3),
    seed=st.randoms(use_true_random=False),
)
def test_vwap_partials_merge_exactly_under_any_partition(
    spark, rows, splits, seed
):
    full = _partials(_df(spark, rows))

    shuffled = list(rows)
    seed.shuffle(shuffled)
    cuts = sorted({min(s, len(shuffled)) for s in splits} | {0, len(shuffled)})
    merged: dict = {}
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        for k, (n, pv, v) in _partials(_df(spark, shuffled[a:b])).items():
            cn, cpv, cv = merged.get(k, (0, 0, 0))
            merged[k] = (cn + n, cpv + pv, cv + v)

    assert merged == full


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),         # symbol
            st.integers(1, 100_000),   # price cents
            st.integers(0, 100),       # volume
            st.integers(0, 29),        # minute (ties ACROSS rows allowed)
        ),
        min_size=1,
        max_size=24,
    ),
    nparts=st.integers(1, 6),
    seed=st.randoms(use_true_random=False),
)
def test_ohlc_tiebreak_is_arrival_order_invariant(spark, rows, nparts, seed):
    """ohlc_candles with a tiebreak column: identical candles for any
    input row order and any partitioning — min_by/max_by over the
    (timestamp, tiebreak) struct is deterministic even with timestamp
    ties, which is exactly why the twin demands the tiebreak column
    (the reference stamps one timestamp per poll batch).  Volume uses
    the exact fixed-point accumulator so sums cannot drift either."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.windows import (
        ohlc_candles,
    )

    schema = (
        "symbol string, current_price double, total_volume double,"
        " timestamp timestamp, tiebreak bigint"
    )

    def run(rs, parts):
        # the tiebreak is a UNIQUE per-row id (as event ids are in the
        # real stream) riding with its row through any permutation —
        # a duplicated (timestamp, tiebreak) key with different
        # prices would be genuinely nondeterministic, which is the
        # operator's documented input contract, not a test target
        df = spark.createDataFrame(
            [
                ("ab"[s], c / 100.0, float(v), _T0 + dt.timedelta(minutes=m), tb)
                for s, c, v, m, tb in rs
            ],
            schema,
        ).repartition(parts)
        return sorted(
            (
                r.symbol, r.window_start, r.open, r.high, r.low, r.close,
                str(r.volume), r.n_ticks,
            )
            for r in ohlc_candles(
                df, window="5 minutes", tiebreak_col="tiebreak",
                exact_volume=True,
            ).collect()
        )

    tagged = [(s_, c, v, m, i) for i, (s_, c, v, m) in enumerate(rows)]
    want = run(tagged, 2)
    shuffled = list(tagged)
    seed.shuffle(shuffled)
    assert run(shuffled, nparts) == want
