"""Unit tests for the batch-58 operators: near-dup pair transitivity
audit and the join-blowup pre-flight estimator.  Oracle equivalence is
check_oracle's job (certified at sf0.01 and sf0.1 this round); these
pin shapes and invariants."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

from conftest import SF_SMALL


def test_dup_transitivity_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dup_transitivity,
    )

    [r] = q_doc_dup_transitivity(spark, SF_SMALL).collect()
    assert r["n_pairs"] >= 1
    assert 0 <= r["n_closed"] <= r["n_wedges"]
    if r["n_wedges"] > 0:
        assert r["closure_ppm"] == r["n_closed"] * 1_000_000 // r["n_wedges"]
        assert 0 <= r["closure_ppm"] <= 1_000_000
    else:
        assert r["closure_ppm"] is None


def test_join_blowup_matches_python_histogram(spark):
    """Recompute sum(cnt^2) and the top keys from the raw parquet and
    compare every reported figure exactly."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        _BLOWUP_TOP,
        q_lineitem_join_blowup,
    )

    rows = q_lineitem_join_blowup(spark, SF_SMALL).collect()
    assert len(rows) == _BLOWUP_TOP
    keys = pq.read_table(
        f"{SF_SMALL}/lineitem.parquet", columns=["l_partkey"]
    )["l_partkey"].to_pylist()
    hist = collections.Counter(keys)
    predicted = sum(c * c for c in hist.values())
    n_rows = len(keys)
    top = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:_BLOWUP_TOP]
    for i, r in enumerate(rows):
        pk, cnt = top[i]
        assert r["rank"] == i + 1
        assert r["l_partkey"] == pk
        assert r["cnt"] == cnt
        assert r["key_pairs"] == cnt * cnt
        assert r["predicted_rows"] == predicted
        assert r["blowup_milli"] == predicted * 1000 // n_rows
        assert r["contribution_ppm"] == cnt * cnt * 1_000_000 // predicted


def test_batch58_plan_pins(spark):
    """No theta joins in the wedge stage (the pair graph joins on the
    shared node, an equi-join); the blowup estimator never executes
    the predicted join (exactly one data-sized hash exchange — the
    key histogram)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_dup_transitivity,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        q_lineitem_join_blowup,
    )

    tplan = q_doc_dup_transitivity(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in tplan
    bplan = q_lineitem_join_blowup(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bplan
    assert "SortMergeJoin" not in bplan  # summaries attach by broadcast
    assert bplan.count("Exchange hashpartitioning") <= 2  # histogram (+AQE top-5 sort path), never the join
