"""Shuffled-arrival / arbitrary-split property tests for the
streaming burst-alert twin (r9 verdict ask #6): hopping-window
counts are map-side-combinable partial aggregates, so for ANY
partition of the event rows into micro-batches (and any arrival
order — event-time windows ignore it), per-batch counts sum-merge
to the one-shot counts, and applying the threshold AFTER the merge
reproduces the batch operator's alert set exactly.  This is the
invariant that makes the streaming update-mode aggregation emit the
same alerts as the batch form regardless of how the engine slices
the stream."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.streaming.alerts import (
    burst_alerts,
)

_SCHEMA = "user_id bigint, ts timestamp"
_T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, _T0 + dt.timedelta(minutes=m)) for u, m in rows], _SCHEMA
    )


def _counts(df, threshold):
    return {
        (r.user_id, r.window_start, r.window_end): r.n_events
        for r in burst_alerts(
            df, threshold=threshold, window="10 minutes", slide="5 minutes"
        ).collect()
    }


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=0,
        max_size=24,
    ),
    splits=st.lists(st.integers(0, 24), max_size=3),
    threshold=st.integers(1, 4),
    seed=st.randoms(use_true_random=False),
)
def test_burst_counts_merge_and_threshold_after(
    spark, rows, splits, threshold, seed
):
    want = _counts(_df(spark, rows), threshold)

    shuffled = list(rows)
    seed.shuffle(shuffled)
    cuts = sorted({min(s, len(shuffled)) for s in splits} | {0, len(shuffled)})
    merged: dict = {}
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        # threshold=1 emits every nonempty window: the raw partials
        for k, n in _counts(_df(spark, shuffled[a:b]), 1).items():
            merged[k] = merged.get(k, 0) + n

    got = {k: n for k, n in merged.items() if n >= threshold}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=1,
        max_size=20,
    ),
    splits=st.lists(st.integers(0, 20), max_size=3),
    replay=st.integers(0, 3),
    seed=st.randoms(use_true_random=False),
)
def test_freshness_max_is_replay_immune_count_is_linear(
    spark, rows, splits, replay, seed
):
    """streaming_freshness's contract split (docstring): last_ts
    (max) merges idempotently — identical under any partition AND a
    replayed batch — while n_events (count) is exactly linear under
    clean splits and double-counts the replayed batch, which is why
    its docstring scopes it to exactly-once delivery."""
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.alerts import (
        streaming_freshness,
    )

    def snap(rs):
        df = spark.createDataFrame(
            [(f"t{u}", _T0 + dt.timedelta(minutes=m)) for u, m in rs],
            "event_type string, ts timestamp",
        )
        return {
            r.event_type: (r.n_events, r.last_ts)
            for r in streaming_freshness(df).collect()
        }

    want = snap(rows)

    shuffled = list(rows)
    seed.shuffle(shuffled)
    cuts = sorted({min(s, len(shuffled)) for s in splits} | {0, len(shuffled)})
    batches = [shuffled[a:b] for a, b in zip(cuts, cuts[1:]) if a != b]
    rep = batches[replay % len(batches)]

    def merge(bs):
        out = {}
        for b in bs:
            for k, (n, ts) in snap(b).items():
                cn, cts = out.get(k, (0, None))
                out[k] = (cn + n, ts if cts is None else max(cts, ts))
        return out

    clean = merge(batches)
    assert clean == want  # linear count + idempotent max, clean splits

    replayed = merge(batches + [rep])
    # max stays correct under the replay; count inflates by the
    # replayed batch's contribution
    for k, (n, ts) in replayed.items():
        assert ts == want[k][1]
        assert n >= want[k][0]
    assert sum(n for n, _ in replayed.values()) == (
        sum(n for n, _ in want.values()) + len(rep)
    )
