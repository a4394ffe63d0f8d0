"""Unit tests for the batch-56 operators: keep-best dedup survivor
selection, the bigram-LM OOV quality score, and the HLL-merge rolling
WAU.  Oracle equivalence is check_oracle's job (certified at sf0.01
and sf0.1 this round); these pin shapes and invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_keep_best_survivor_dominates(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dup_clusters,
        q_doc_keep_best_dedup,
    )

    rows = q_doc_keep_best_dedup(spark, SF_SMALL).collect()
    assert rows
    clusters = {
        r["cluster_id"]: r["members"]
        for r in q_doc_clusters_compat(q_doc_dup_clusters(spark, SF_SMALL))
    }
    assert set(r["cluster_id"] for r in rows) == set(clusters)
    for r in rows:
        members = [int(x) for x in clusters[r["cluster_id"]].split(",")]
        assert r["n_docs"] == len(members) >= 2
        assert r["survivor_id"] in members
        assert r["survivor_tokens"] >= 1
        assert r["tokens_dropped"] >= r["n_docs"] - 1  # each dropped doc >= 1 token


def q_doc_clusters_compat(df):
    return df.collect()


def test_ngram_lm_scores_valid_split_only(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        hash_split,
        lcg_bucket,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_ngram_lm_hit_rate,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_doc_ngram_lm_hit_rate(spark, SF_SMALL).collect()
    assert rows
    split_of = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            load_table(spark, SF_SMALL, "documents"), "doc_id", hasher=lcg_bucket
        )
        .select("doc_id", "split")
        .collect()
    }
    for r in rows:
        assert split_of[r["doc_id"]] == "valid"
        assert 0 <= r["n_oov"] <= r["n_bigrams"]
        assert r["oov_ppm"] == r["n_oov"] * 1_000_000 // r["n_bigrams"]
        assert r["flagged"] == (r["oov_ppm"] >= 500_000)


def test_hll_rolling_wau_tracks_exact(spark):
    """The sketch estimate must stay within the HLL error envelope of
    the exact rolling distinct (64 registers -> ~13% standard error;
    assert a generous 40% band) and be monotone-consistent: a window
    superset can only fill more registers."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_events_hll_rolling_wau,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_rolling_wau,
    )

    est = {r["day"]: r for r in q_events_hll_rolling_wau(spark, SF_SMALL).collect()}
    exact = {r["day"]: r for r in q_events_rolling_wau(spark, SF_SMALL).collect()}
    assert est
    # same day spine as the exact query
    assert set(est) == set(exact)
    wau_col = next(c for c in ("wau", "rolling_wau") if c in next(iter(exact.values())).asDict())
    for day, r in est.items():
        truth = exact[day][wau_col]
        assert truth > 0
        # each filled register needs >= 1 distinct user behind it
        assert 1 <= r["registers_filled"] <= min(64, truth)
        assert r["wau_hll"] >= 1
        if truth >= 160:
            # the raw-estimator regime (>= 2.5 * 64 registers; below
            # it the documented small-range bias applies — sketch.py
            # deliberately omits the non-portable ln() linear-count
            # branch): ~13% standard error, assert a generous band
            assert abs(r["wau_hll"] - truth) <= int(truth * 0.4)


def test_keep_best_broadcasts_cluster_map(spark):
    """The cluster map (pair-connected docs only) must broadcast onto
    the token table — a shuffle join here would reshuffle the corpus
    for a tiny build side."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_keep_best_dedup,
    )

    plan = q_doc_keep_best_dedup(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_rolling_wau_no_nested_loop(spark):
    """The day-offset explode must keep the window merge an equi-join:
    no theta join (BNLJ/cartesian) anywhere in the plan."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_events_hll_rolling_wau,
    )

    plan = q_events_hll_rolling_wau(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
