"""Shuffled-arrival / replay property tests for the sketch twins
(r9 verdict ask #6): streaming_hll's register table is a MAX
aggregate (associative + commutative + IDEMPOTENT — so immune to
at-least-once replays), and streaming_histogram / streaming_cms are
SUM aggregates (linear, so any partition of the rows merges to the
one-shot sketch).  Hypothesis draws the rows, an arbitrary partition
into micro-batches, a per-batch arrival permutation, and (for HLL) a
replayed batch; per-batch sketches built by the REAL operators must
merge to exactly the batch-built sketch."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.functions.sketch import (
    hll_merge_estimate,
    streaming_cms,
    streaming_histogram,
    streaming_hll,
)


def _cuts(splits, n):
    return sorted({min(s, n) for s in splits} | {0, n})


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(0, 40), min_size=0, max_size=30),
    splits=st.lists(st.integers(0, 30), max_size=3),
    replay=st.integers(0, 3),
    seed=st.randoms(use_true_random=False),
)
def test_hll_registers_max_merge_and_replay_immunity(
    spark, keys, splits, replay, seed
):
    df_all = spark.createDataFrame([(f"k{k}",) for k in keys], "k string")
    want = {
        (r.bucket): r.max_rho for r in streaming_hll(df_all, "k").collect()
    }

    shuffled = list(keys)
    seed.shuffle(shuffled)
    cuts = _cuts(splits, len(shuffled))
    batches = [shuffled[a:b] for a, b in zip(cuts, cuts[1:]) if a != b]
    if batches:
        # at-least-once delivery: one batch arrives twice
        batches.append(batches[replay % len(batches)])
    merged: dict = {}
    for b in batches:
        bdf = spark.createDataFrame([(f"k{k}",) for k in b], "k string")
        for r in streaming_hll(bdf, "k").collect():
            merged[r.bucket] = max(merged.get(r.bucket, 0), r.max_rho)
    assert merged == want

    # the merged snapshot estimates identically to the batch sketch
    if keys:
        est_all = hll_merge_estimate(streaming_hll(df_all, "k")).collect()[0]
        mdf = spark.createDataFrame(
            [(b, r) for b, r in merged.items()], "bucket bigint, max_rho int"
        )
        est_merged = hll_merge_estimate(mdf).collect()[0]
        assert (est_merged.n_estimate, est_merged.registers_filled) == (
            est_all.n_estimate,
            est_all.registers_filled,
        )


@settings(max_examples=10, deadline=None)
@given(
    # tenths, spanning below lo=0 and above hi=10 to exercise clamping
    tenths=st.lists(st.integers(-50, 150), min_size=0, max_size=30),
    splits=st.lists(st.integers(0, 30), max_size=3),
    seed=st.randoms(use_true_random=False),
)
def test_histogram_counts_sum_merge_with_clamping(spark, tenths, splits, seed):
    def hist(vals):
        df = spark.createDataFrame([(t / 10.0,) for t in vals], "v double")
        return {
            r.bucket: r.n
            for r in streaming_histogram(
                df, "v", lo=0.0, hi=10.0, n_buckets=5
            ).collect()
        }

    want = hist(tenths)
    # every bucket index in range despite out-of-range values
    assert all(0 <= b < 5 for b in want)

    shuffled = list(tenths)
    seed.shuffle(shuffled)
    cuts = _cuts(splits, len(shuffled))
    merged: dict = {}
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        for k, n in hist(shuffled[a:b]).items():
            merged[k] = merged.get(k, 0) + n
    assert merged == want


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(0, 40), min_size=0, max_size=30),
    splits=st.lists(st.integers(0, 30), max_size=3),
    seed=st.randoms(use_true_random=False),
)
def test_cms_cells_sum_merge(spark, keys, splits, seed):
    def cells(vals):
        df = spark.createDataFrame([(f"k{k}",) for k in vals], "k string")
        return {
            (r.j, r.bucket): r.cnt
            for r in streaming_cms(df, "k", depth=2, width=16).collect()
        }

    want = cells(keys)
    shuffled = list(keys)
    seed.shuffle(shuffled)
    cuts = _cuts(splits, len(shuffled))
    merged: dict = {}
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        for k, n in cells(shuffled[a:b]).items():
            merged[k] = merged.get(k, 0) + n
    assert merged == want
