"""Shuffled-arrival / arbitrary-split property tests for the CDC
apply twin (r9 verdict ask #6): folding ``merge_upsert`` — the exact
kernel ``streaming/cdc.py::run_cdc_apply`` runs per micro-batch —
over ANY seq-contiguous split of a change stream (with any arrival
order INSIDE a batch; the seq column resolves keep-last) must land
on exactly the table that one-shot-merging the whole change set
produces.  Inserts, updates, deletes, re-inserts after delete,
multiple changes per key within and across batches, and deletes of
absent keys are all drawn by hypothesis."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.operators.merge import (
    merge_upsert,
)

_BASE_SCHEMA = "k bigint, val string"
_CHG_SCHEMA = "k bigint, val string, op string, seq bigint"


def _table(df):
    return sorted((r.k, r.val) for r in df.collect())


@settings(max_examples=10, deadline=None)
@given(
    base=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
    changes=st.lists(
        st.tuples(st.integers(0, 7), st.sampled_from("IUD")),
        min_size=0,
        max_size=16,
    ),
    splits=st.lists(st.integers(0, 16), max_size=3),
    seed=st.randoms(use_true_random=False),
)
def test_cdc_fold_matches_one_shot_merge(spark, base, changes, splits, seed):
    base_df = spark.createDataFrame(
        [(k, f"base{k}") for k in base], _BASE_SCHEMA
    )
    chg_rows = [
        (k, f"v{i}", op, i) for i, (k, op) in enumerate(changes)
    ]
    all_df = spark.createDataFrame(chg_rows, _CHG_SCHEMA)
    want = _table(merge_upsert(base_df, all_df, "k", seq_col="seq"))

    cuts = sorted({min(s, len(chg_rows)) for s in splits} | {0, len(chg_rows)})
    state = base_df
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        batch = list(chg_rows[a:b])
        seed.shuffle(batch)  # arrival order inside a batch is free
        state = merge_upsert(
            state,
            spark.createDataFrame(batch, _CHG_SCHEMA),
            "k",
            seq_col="seq",
        )
    assert _table(state) == want
