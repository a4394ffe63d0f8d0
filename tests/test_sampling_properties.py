"""Property-based checks (hypothesis) for the sampling primitives:
the distributed implementations must agree with straightforward
single-threaded reference implementations on arbitrary inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    LCG_A,
    LCG_C,
    LCG_M,
    hash_split,
    lcg_bucket,
    pack_chunks,
    per_group_cap,
    stratified_sample,
    xxhash_bucket,
)

# One spark fixture per module is session-scoped; hypothesis drives
# many examples through the same session. Keep example counts small:
# each example is a full Spark job.
EXAMPLES = 10


def lcg(key: int, buckets: int = 100) -> int:
    # Python % is already a positive mod for positive modulus — the
    # same pmod semantics the Spark/SQL twins now use.
    return ((key * LCG_A + LCG_C) % LCG_M) % buckets


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60),
    st.integers(min_value=16, max_value=2048),
)
def test_pack_chunks_matches_sequential_reference(spark, token_counts, budget):
    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: (r["start_chunk"], r["end_chunk"])
        for r in pack_chunks(df, "doc_id", "n_tokens", budget, bucket_size=7).collect()
    }
    total = 0
    for i, n in rows:
        want = (total // budget, (total + n - 1) // budget)
        assert got[i] == want
        total += n


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_stratified_sample_matches_reference(spark, rows, frac):
    df = spark.createDataFrame(rows, ["key", "stratum"])
    got = sorted(
        r["key"]
        for r in stratified_sample(
            df, "stratum", "key", frac, hasher=lcg_bucket
        ).collect()
    )
    want = []
    fq = round(frac * 1_000_000)
    for s in {"a", "b", "c"}:
        # rank on the FULL-WIDTH hash state; cut at the integer-exact
        # quantized ceil — the operator's documented contract
        members = sorted(
            (k for k, g in rows if g == s),
            key=lambda k: (lcg(k, LCG_M), k),
        )
        n_keep = (len(members) * fq + 999_999) // 1_000_000
        want.extend(members[:n_keep])
    assert got == sorted(want)


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),  # incl. keys past the LCG cliff
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.integers(min_value=1, max_value=40),
)
def test_hash_split_partition_invariant_default_hasher(spark, keys, nparts):
    """The production (xxhash) split must be a pure function of the
    key: identical assignment under any partition count, and defined
    (non-null, valid name) for 64-bit keys where the LCG overflows."""
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    base = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", hasher=xxhash_bucket).select("doc_id", "split").collect()
    }
    reparted = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(nparts), "doc_id", hasher=xxhash_bucket)
        .select("doc_id", "split")
        .collect()
    }
    assert base == reparted
    assert set(base.values()) <= {"train", "valid", "test"}
    assert None not in base.values()


@settings(max_examples=EXAMPLES, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 5)),  # (id, group)
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=4),
)
def test_per_group_cap_matches_reference(spark, rows, cap):
    df = spark.createDataFrame(rows, ["id", "grp"])
    got = sorted(r["id"] for r in per_group_cap(df, "grp", ["id"], cap).collect())
    want = []
    by_group: dict[int, list[int]] = {}
    for i, g in rows:
        by_group.setdefault(g, []).append(i)
    for g, members in by_group.items():
        want.extend(sorted(members)[:cap])
    assert got == sorted(want)
