"""Sampling / splitting primitives (functions/sampling.py): split
determinism under repartitioning, exact stratified fractions,
per-group cap enforcement, and the WindowGroupLimit plan pin that
makes the cap scale-safe.  Value-level correctness runs through the
DuckDB oracle gate (doc_hash_split, doc_stratified_sample,
events_per_user_cap)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    hash_split,
    lcg_bucket,
    per_group_cap,
    stratified_sample,
    xxhash_bucket,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_split_deterministic_under_repartitioning(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", hasher=xxhash_bucket).select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13), "doc_id", hasher=xxhash_bucket).select("doc_id", "split").collect()
    }
    assert a == b


def test_split_covers_every_row_and_ratios(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    counts = {r["split"]: r["n"] for r in hash_split(docs, "doc_id", hasher=xxhash_bucket).groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total  # no row unassigned
    assert set(counts) == {"train", "valid", "test"}
    # hash uniformity: train share within a loose band of 80%
    assert 0.6 * total <= counts["train"] <= 0.95 * total


def test_stratified_sample_exact_per_stratum(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    want = {
        r["lang"]: math.ceil(r["n"] * 0.1)
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "lang", "doc_id", 0.1, hasher=xxhash_bucket)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want  # EXACT ceil(frac*n) per stratum, not Bernoulli-approximate


def test_stratified_sample_stable_membership(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    ids1 = {r["doc_id"] for r in stratified_sample(docs, "lang", "doc_id", 0.1, hasher=xxhash_bucket).select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(7), "lang", "doc_id", 0.1, hasher=xxhash_bucket).select("doc_id").collect()
    }
    assert ids1 == ids2


def test_per_group_cap_enforced_and_keeps_earliest(spark):
    events = load_table(spark, SF_SMALL, "events")
    capped = per_group_cap(events, "user_id", ["ts", "event_id"], cap=3)
    per_user = capped.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("ts").alias("max_kept")
    )
    assert per_user.filter(F.col("n") > 3).count() == 0
    # users with >3 events keep exactly 3, and they are the EARLIEST 3
    sample_user = (
        events.groupBy("user_id").agg(F.count("*").alias("n")).filter(F.col("n") > 3).first()["user_id"]
    )
    kept = sorted(
        r["event_id"]
        for r in capped.filter(F.col("user_id") == sample_user).select("event_id").collect()
    )
    first3 = [
        r["event_id"]
        for r in events.filter(F.col("user_id") == sample_user)
        .orderBy("ts", "event_id")
        .limit(3)
        .select("event_id")
        .collect()
    ]
    assert kept == sorted(first3)


def test_per_group_cap_uses_window_group_limit(spark):
    # the partial group-limit must discard rows BEFORE the shuffle —
    # the property that keeps shuffle volume O(groups*cap), not O(rows)
    events = load_table(spark, SF_SMALL, "events")
    plan = per_group_cap(events, "user_id", ["ts", "event_id"], cap=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_lcg_bucket_range(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    mm = docs.select(lcg_bucket("doc_id", 100).alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] <= 99


def test_pack_chunks_invariant_to_bucket_size(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import pack_chunks
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import token_count

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    a = {
        r["doc_id"]: (r["start_chunk"], r["end_chunk"])
        for r in pack_chunks(docs, "doc_id", "n_tokens", 512, bucket_size=1000).collect()
    }
    b = {
        r["doc_id"]: (r["start_chunk"], r["end_chunk"])
        for r in pack_chunks(docs, "doc_id", "n_tokens", 512, bucket_size=37).collect()
    }
    assert a == b  # bucketed prefix sum == global prefix sum, any bucketing


def test_pack_chunks_contiguous_coverage(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import pack_chunks
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import token_count

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    rows = (
        pack_chunks(docs, "doc_id", "n_tokens", 512)
        .orderBy("doc_id")
        .collect()
    )
    # spans are monotone and gapless: next doc starts in the same or
    # the immediately following chunk of the previous doc's end
    total = 0
    for r in rows:
        assert r["start_chunk"] == total // 512
        total += r["n_tokens"]
        assert r["end_chunk"] == (total - 1) // 512


def test_mixture_sample_epoch_semantics(spark):
    """floor(w) full copies + deterministic fractional slice; weight-0
    sources drop; unknown sources take the default; copy_idx is dense
    0..n-1 per kept row."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        lcg_bucket,
        mixture_sample,
    )

    rows = [(i, "a" if i < 40 else ("b" if i < 80 else "z")) for i in range(120)]
    df = spark.createDataFrame(rows, ["k", "source"])
    out = mixture_sample(
        df, "k", {"a": 2.5, "b": 0.0}, default=1.0, hasher=lcg_bucket
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # b dropped entirely
    assert "b" not in by_src
    # z (default 1.0): exactly one copy per row, copy_idx 0
    assert len(by_src["z"]) == 40 and all(r["copy_idx"] == 0 for r in by_src["z"])
    # a: every key appears 2 or 3 times, fractional slice deterministic
    from collections import Counter

    counts = Counter(r["k"] for r in by_src["a"])
    assert set(counts.keys()) == set(range(40))
    assert all(c in (2, 3) for c in counts.values())
    expected_extra = {k for k in range(40) if ((k * 1103515245 + 12345) % 2_147_483_648) % 10_000 < 5_000}
    assert {k for k, c in counts.items() if c == 3} == expected_extra
    # copy_idx dense per key
    for k in range(40):
        idxs = sorted(r["copy_idx"] for r in by_src["a"] if r["k"] == k)
        assert idxs == list(range(len(idxs)))
    # rerun is identical (pure key arithmetic, no RNG)
    again = mixture_sample(
        df.repartition(7), "k", {"a": 2.5, "b": 0.0}, default=1.0, hasher=lcg_bucket
    ).collect()
    assert sorted((r["k"], r["source"], r["copy_idx"]) for r in again) == sorted(
        (r["k"], r["source"], r["copy_idx"]) for r in out
    )


def test_lcg_bucket_nonnegative_for_negative_keys(spark):
    """SQL % keeps the dividend sign — pmod (not %) against the LCG
    modulus is what keeps negative keys from landing in bucket < 0
    (which would route every negative-key row into the first split)."""
    import duckdb

    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        sql_lcg_bucket,
    )

    keys = [-2, -1, -1_000_000_007, 0, 1, 2**32]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", lcg_bucket("k", 100).alias("b")).collect()
    }
    assert all(0 <= b <= 99 for b in got.values()), got
    # the SQL twin stays in lockstep on the same keys
    for k in keys:
        (b,) = duckdb.sql(f"SELECT {sql_lcg_bucket(str(k))}").fetchone()
        assert b == got[k], (k, b, got[k])


def test_hash_split_rejects_bad_percentages(spark):
    import pytest

    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(docs, "doc_id", {"train": 80, "valid": 10}, hasher=lcg_bucket)
    with pytest.raises(ValueError, match="positive ints"):
        hash_split(
            docs, "doc_id", {"a": 99.5, "b": 0.5}, hasher=lcg_bucket
        )


def test_stratified_sample_no_float_ceil_overshoot(spark):
    """100 * 0.07 is 7.000000000000001 in doubles; a float-ceil keep
    rule returns 8 rows — the integer-quantized cutoff keeps exactly
    ceil(0.07 * 100) = 7."""
    df = spark.createDataFrame([(i, "x") for i in range(100)], ["k", "s"])
    out = stratified_sample(df, stratum="s", key="k", fraction=0.07, hasher=lcg_bucket)
    assert out.count() == 7


def test_pack_chunks_zero_token_row_keeps_valid_span(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        pack_chunks,
    )

    # row 1 has 0 tokens and sits exactly on the chunk boundary
    # (_excl = 4 = budget) — the raw end formula would give
    # end_chunk = 0 < start_chunk = 1
    df = spark.createDataFrame([(0, 4), (1, 0), (2, 3)], ["k", "t"])
    spans = {
        r["k"]: (r["start_chunk"], r["end_chunk"])
        for r in pack_chunks(df, "k", "t", budget=4, bucket_size=10).collect()
    }
    assert spans[1] == (1, 1)
    assert all(s <= e for s, e in spans.values()), spans


def test_pack_chunks_rejects_degenerate_parameters(spark):
    import pytest

    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        pack_chunks,
    )

    df = spark.createDataFrame([(0, 4)], ["k", "t"])
    with pytest.raises(ValueError, match="budget"):
        pack_chunks(df, "k", "t", budget=0)
    with pytest.raises(ValueError, match="bucket_size"):
        pack_chunks(df, "k", "t", budget=4, bucket_size=0)


def test_mixture_sql_escapes_quoted_source_names(spark):
    import duckdb

    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        sql_mixture_n_copies,
    )

    sql = sql_mixture_n_copies("7", "'o''reilly'", {"o'reilly": 1.5})
    (n,) = duckdb.sql(f"SELECT {sql}").fetchone()
    assert n in (1, 2)  # parses and evaluates; 1 or 2 copies by hash slice
