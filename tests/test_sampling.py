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
