"""Unit tests for the batch-60 operators: eval-side contamination
coverage, weight-proportional deterministic sampling, the active-days
(power-user) histogram, and the session entry/exit matrix.  Oracle
equivalence is check_oracle's job (certified at sf0.01 and sf0.1 this
round); these pin shapes and invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_eval_contamination_mirrors_decontaminate(spark):
    """Coverage is a [0,1] fraction over the TEST split only; the set
    of scored doc ids must be exactly the test-split docs with >= 1
    shingle, disjoint from doc_decontaminate's train-split ids."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_decontaminate,
        q_doc_eval_contamination,
    )

    rows = q_doc_eval_contamination(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_shingles"] >= 1
        assert 0 <= r["leaked"] <= r["n_shingles"]
        assert abs(r["contamination"] - r["leaked"] / r["n_shingles"]) < 1e-12
    eval_ids = {r["doc_id"] for r in rows}
    train_ids = {r["doc_id"] for r in q_doc_decontaminate(spark, SF_SMALL).collect()}
    assert eval_ids and not (eval_ids & train_ids)


def test_eval_contamination_known_leak(spark):
    """A test doc sharing a full sentence with a train doc must score
    leaked > 0; a test doc of unique tokens must score 0."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        eval_contamination_report,
    )

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [
            (10, "quick brown fox jumps again"),
            (11, "zzz yyy xxx www vvv"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in eval_contamination_report(train, evald).collect()
    }
    # "quick brown fox" and "brown fox jumps" leak; the rest don't.
    assert got[10]["leaked"] == 2
    assert got[11]["leaked"] == 0
    assert got[11]["contamination"] == 0.0


def test_weighted_sample_determinism_and_bias(spark):
    """The sample is a deterministic function of doc_id (two runs
    agree); inclusion ppm is length-proportional, so the sampled share
    of CHARS must exceed the sampled share of DOCS (long docs are
    favored) unless the sample is degenerate."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        q_doc_weighted_sample,
    )

    a = sorted(
        (r["source"], r["n_sampled"], r["sampled_chars"])
        for r in q_doc_weighted_sample(spark, SF_SMALL).collect()
    )
    b = sorted(
        (r["source"], r["n_sampled"], r["sampled_chars"])
        for r in q_doc_weighted_sample(spark, SF_SMALL).collect()
    )
    assert a == b
    rows = q_doc_weighted_sample(spark, SF_SMALL).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_sampled = sum(r["n_sampled"] for r in rows)
    assert 0 < n_sampled < n_docs
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        assert 0 <= r["expected_ppm_sum"] <= r["n_docs"] * 1_000_000


def test_weighted_sample_expected_rate(spark):
    """First-order pps design: sum of inclusion ppm across the corpus
    approximates the target draw count (exact up to the per-doc floor
    and the min(1, .) cap), and the realized draw lands near it."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        _WS_TARGET_DOCS,
        q_doc_weighted_sample,
    )

    rows = q_doc_weighted_sample(spark, SF_SMALL).collect()
    expected = sum(r["expected_ppm_sum"] for r in rows) / 1_000_000
    n_sampled = sum(r["n_sampled"] for r in rows)
    # floor() only under-counts, the cap only under-counts:
    assert expected <= _WS_TARGET_DOCS
    # and the lcg draw should land within ~5 sigma of the design
    assert abs(n_sampled - expected) < 5 * max(expected, 1) ** 0.5 + 5


def test_active_days_histogram_reconciles(spark):
    """Buckets partition the user base: n_users sums to the distinct
    user count, depths stay within the 30-day span, shares floor-sum
    to <= 1e6 within one step per bucket."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_active_days_histogram,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_events_active_days_histogram(spark, SF_SMALL).collect()
    assert rows
    n_users = (
        load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < total_share <= 1_000_000
    for r in rows:
        assert 1 <= r["active_days"] <= 31


def test_entry_exit_reconciles_with_sessionize(spark):
    """The matrix's session total must equal the certified sessionize
    query's session count; single-event sessions land on the
    diagonal, so diagonal mass >= the bounce count is implied by
    construction (every 1-event session has entry == exit)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_entry_exit,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.relational import (
        q_events_sessionize,
    )

    rows = q_events_entry_exit(spark, SF_SMALL).collect()
    assert rows
    n_sessions = sum(r["n_sessions"] for r in rows)
    assert n_sessions == q_events_sessionize(spark, SF_SMALL).count()
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < total_share <= 1_000_000


def test_entry_exit_tie_break_deterministic(spark):
    """Two events at the SAME timestamp: the lower event_id is the
    entry and the higher is the exit, regardless of input row order."""
    import datetime

    from pyspark.sql import functions as F
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            (2, base, 7, "purchase", 0.0, "{}"),
            (1, base, 7, "view", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )

    orig = behavior.load_table
    behavior.load_table = lambda s, d, t: ev
    try:
        rows = behavior.q_events_entry_exit(spark, SF_SMALL).collect()
    finally:
        behavior.load_table = orig
    assert len(rows) == 1
    assert rows[0]["entry_type"] == "view"
    assert rows[0]["exit_type"] == "purchase"
    assert rows[0]["n_sessions"] == 1

    # reversed physical order gives the identical verdict
    ev2 = ev.orderBy(F.col("event_id").desc())
    behavior.load_table = lambda s, d, t: ev2
    try:
        rows2 = behavior.q_events_entry_exit(spark, SF_SMALL).collect()
    finally:
        behavior.load_table = orig
    assert rows2 == rows


def test_batch60_plan_pins(spark):
    """entry/exit: ONE corpus-sized exchange (the user key) serves all
    window passes and the session rollup — the later exchanges carry
    only the <= |types|^2-row histogram; eval contamination never
    sort-merge-joins (everything rides broadcasts); the weighted
    sample's only join is the 1-row scalar attach."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_entry_exit,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        q_doc_weighted_sample,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_eval_contamination,
    )

    eplan = (
        q_events_entry_exit(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in eplan
    assert "SortMergeJoin" not in eplan

    cplan = (
        q_doc_eval_contamination(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in cplan
    assert "SortMergeJoin" not in cplan
    assert "BroadcastHashJoin" in cplan

    wplan = (
        q_doc_weighted_sample(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in wplan
    assert "SortMergeJoin" not in wplan
