"""Property-based checks (hypothesis) for the round-8 batch-60
kernels: eval-side contamination coverage, weight-proportional
sampling, and the session entry/exit matrix must agree with
straightforward single-threaded reference implementations on
arbitrary inputs.  Spark-driven examples stay small (each example is
a full Spark job — same convention as test_sampling_properties)."""

from __future__ import annotations

import datetime
import re

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    LCG_A,
    LCG_C,
    LCG_M,
)

EXAMPLES = 10


# ---------------------------------------------------------------------------
# Weight-proportional sampling: pure-arithmetic design properties
# ---------------------------------------------------------------------------

def _p_ppm(w: int, target: int, total: int) -> int:
    return min(1_000_000, (w * target * 1_000_000) // total)


def _coin(doc_id: int) -> int:
    return ((doc_id * LCG_A + LCG_C) % LCG_M) % 1_000_000


@settings(max_examples=300, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=200),
    target=st.integers(min_value=1, max_value=500),
)
def test_pps_design_first_order_bounds(weights, target):
    """The floored-ppm pps design never over-allocates (sum of
    inclusion probabilities <= target) and each uncapped p_i is
    within one floor step of the exact w_i/W share."""
    total = sum(weights)
    ppm = [_p_ppm(w, target, total) for w in weights]
    assert sum(ppm) <= target * 1_000_000
    for w, p in zip(weights, ppm):
        exact = w * target * 1_000_000 / total
        if p < 1_000_000:  # uncapped
            assert exact - 1 < p <= exact
        else:
            assert exact >= 1_000_000 - 1  # cap only fires at/above 1


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc_id
            st.integers(min_value=1, max_value=5_000),  # n_chars
            st.sampled_from(["cc", "wiki", "code"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_matches_reference(spark, docs):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import sampling as S

    df = spark.createDataFrame(
        [(i, f"d{i}", "en", src, n) for i, n, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = S.load_table
    S.load_table = lambda s, d, t: df
    try:
        got = {
            r["source"]: (r["n_docs"], r["n_sampled"], r["sampled_chars"])
            for r in S.q_doc_weighted_sample(spark, "unused").collect()
        }
    finally:
        S.load_table = orig

    total = sum(n for _i, n, _s in docs)
    want: dict[str, list[int]] = {}
    for i, n, src in docs:
        w = want.setdefault(src, [0, 0, 0])
        w[0] += 1
        if _coin(i) < _p_ppm(n, S._WS_TARGET_DOCS, total):
            w[1] += 1
            w[2] += n
    assert got == {k: tuple(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# Eval-side contamination coverage vs a set-based reference
# ---------------------------------------------------------------------------

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_texts = st.lists(
    st.lists(_words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = re.split(r"\s+", text)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@settings(max_examples=EXAMPLES, deadline=None)
@given(train=_texts, evald=_texts)
def test_eval_contamination_matches_set_reference(spark, train, evald):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        eval_contamination_report,
    )

    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(evald)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["leaked"])
        for r in eval_contamination_report(tr, ev).collect()
    }

    train_sh: set[str] = set()
    for t in train:
        train_sh |= _shingles(t)
    want = {}
    for i, t in enumerate(evald):
        sh = _shingles(t)
        if sh:
            want[100 + i] = (len(sh), len(sh & train_sh))
    assert got == want


# ---------------------------------------------------------------------------
# Session entry/exit matrix vs a sequential sessionizer
# ---------------------------------------------------------------------------

_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),  # ts seconds (spans >1800 gaps)
        st.integers(min_value=0, max_value=3),  # user
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=60,
)


def _reference_matrix(rows):
    """Sequential 30-min sessionizer: per user, order by (ts, eid),
    split on gap > 1800, record (first, last) types per session."""
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, (t, u, et) in enumerate(rows):
        by_user.setdefault(u, []).append((t, eid, et))
    matrix: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        sessions: list[list[str]] = []
        prev_t = None
        for t, _eid, et in seq:
            if prev_t is None or t - prev_t > 1800:
                sessions.append([])
            sessions[-1].append(et)
            prev_t = t
        for s in sessions:
            key = (s[0], s[-1])
            matrix[key] = matrix.get(key, 0) + 1
    return matrix


@settings(max_examples=EXAMPLES, deadline=None)
@given(rows=_event_rows, seed=st.randoms(use_true_random=False))
def test_entry_exit_matches_sequential_reference(spark, rows, seed):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior

    base = datetime.datetime(2024, 1, 1)
    data = [
        (eid, base + datetime.timedelta(seconds=t), u, et, 0.0, "{}")
        for eid, (t, u, et) in enumerate(rows)
    ]
    seed.shuffle(data)  # physical order must not matter
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = behavior.load_table
    behavior.load_table = lambda s, d, t: df
    try:
        got = {
            (r["entry_type"], r["exit_type"]): r["n_sessions"]
            for r in behavior.q_events_entry_exit(spark, "unused").collect()
        }
    finally:
        behavior.load_table = orig
    assert got == _reference_matrix(rows)


# ---------------------------------------------------------------------------
# Batch-59 overnight/intraday decomposition vs a sequential reference
# ---------------------------------------------------------------------------

_ticks = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # symbol index
        st.integers(min_value=0, max_value=4),  # day
        st.integers(min_value=0, max_value=86_399),  # second of day
        st.integers(min_value=1, max_value=200_000),  # price in cents
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=EXAMPLES, deadline=None)
@given(ticks=_ticks)
def test_overnight_intraday_matches_reference(spark, ticks):
    import math

    from pyspark.sql import Row

    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance

    rows = [
        Row(
            symbol=f"c{sym}",
            current_price=cents / 100.0,
            timestamp=datetime.datetime(2024, 1, 1 + day)
            + datetime.timedelta(seconds=sec),
            event_id=eid,
        )
        for eid, (sym, day, sec, cents) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, current_price double, timestamp timestamp, event_id long",
    )
    orig = finance.prices_from_events
    finance.prices_from_events = lambda s, d: df
    try:
        got = {
            r["symbol"]: (
                r["n_days"],
                r["overnight_mean_ppm"],
                r["intraday_mean_ppm"],
                r["overnight_dominant_days"],
            )
            for r in finance.q_prices_overnight_intraday(spark, "unused").collect()
        }
    finally:
        finance.prices_from_events = orig

    # sequential reference: per (symbol, day) open/close by event_id
    # extremes, lag close, clamped floor-ppm legs, floored means
    daily: dict[tuple[str, int], tuple] = {}
    for eid, (sym, day, _sec, cents) in enumerate(ticks):
        key = (f"c{sym}", day)
        cur = daily.get(key)
        if cur is None:
            daily[key] = (eid, cents / 100.0, eid, cents / 100.0)
        else:
            omin, oprice, cmax, cprice = cur
            if eid < omin:
                omin, oprice = eid, cents / 100.0
            if eid > cmax:
                cmax, cprice = eid, cents / 100.0
            daily[key] = (omin, oprice, cmax, cprice)

    def ppm(num, den):
        return max(-1_000_000, min(1_000_000, math.floor(num * 1_000_000.0 / den)))

    want = {}
    by_sym: dict[str, list] = {}
    for (sym, day), (_a, o, _b, c) in sorted(daily.items()):
        by_sym.setdefault(sym, []).append((day, o, c))
    for sym, seq in by_sym.items():
        rets = []
        for (pd_, po, pc), (d, o, c) in zip(seq, seq[1:]):
            rets.append((ppm(o - pc, pc), ppm(c - o, o)))
        if rets:
            n = len(rets)
            want[sym] = (
                n,
                math.floor(sum(r[0] for r in rets) / n),
                math.floor(sum(r[1] for r in rets) / n),
                sum(1 for r in rets if abs(r[0]) > abs(r[1])),
            )
    assert got == want


# ---------------------------------------------------------------------------
# Batch-59 volatility signature vs a sequential reference
# ---------------------------------------------------------------------------

@settings(max_examples=EXAMPLES, deadline=None)
@given(ticks=_ticks)
def test_vol_signature_matches_reference(spark, ticks):
    import math

    from pyspark.sql import Row

    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance

    rows = [
        Row(
            symbol=f"c{sym}",
            current_price=cents / 100.0,
            timestamp=datetime.datetime(2024, 1, 1 + day)
            + datetime.timedelta(seconds=sec),
            event_id=eid,
        )
        for eid, (sym, day, sec, cents) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, current_price double, timestamp timestamp, event_id long",
    )
    orig = finance.prices_from_events
    finance.prices_from_events = lambda s, d: df
    try:
        got = {
            (r["symbol"], r["scale"]): (r["n_obs"], r["rv_ppm2"], r["mean_abs_ppm"])
            for r in finance.q_prices_vol_signature(spark, "unused").collect()
        }
    finally:
        finance.prices_from_events = orig

    # session timezone is UTC (engine default), so the reference
    # epoch must be UTC too — not the host-local .timestamp()
    epoch0 = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
    )
    want = {}
    for scale in finance._SIG_SCALES:
        # bucket close = price at the max event_id per (symbol, bucket)
        closes: dict[tuple[str, int], tuple[int, float]] = {}
        for eid, (sym, day, sec, cents) in enumerate(ticks):
            es = epoch0 + (day * 86_400) + sec
            key = (f"c{sym}", es // scale)
            if key not in closes or eid > closes[key][0]:
                closes[key] = (eid, cents / 100.0)
        by_sym: dict[str, list] = {}
        for (sym, bucket), (_eid, close) in sorted(closes.items()):
            by_sym.setdefault(sym, []).append(close)
        for sym, seq in by_sym.items():
            rs = [
                max(
                    -1_000_000,
                    min(1_000_000, math.floor((c - p) * 1_000_000.0 / p)),
                )
                for p, c in zip(seq, seq[1:])
            ]
            if rs:
                want[(sym, scale)] = (
                    len(rs),
                    sum(r * r for r in rs),
                    math.floor(sum(abs(r) for r in rs) / len(rs)),
                )
    assert got == want
