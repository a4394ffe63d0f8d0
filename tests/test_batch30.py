"""Unit tests for the batch-30 operators: CAPM beta, SLO burn,
sampling plan, and ABC/XYZ classification.  Query-level equivalence
vs DuckDB is the oracle harness's job (check_oracle-certified at
sf0.01 and sf0.1 this round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_beta_is_finite_and_market_averages_to_one(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_beta,
    )

    rows = q_prices_beta(spark, SF_SMALL).collect()
    assert rows
    betas = [r["beta"] for r in rows]
    assert all(b == b for b in betas)  # no NaN
    # regression of components on their (floored-mean) aggregate:
    # the cross-sectional average beta sits near 1
    mean_beta = sum(betas) / len(betas)
    assert 0.2 < mean_beta < 5.0


def test_slo_burn_cumulative_is_a_prefix_sum(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_slo_burn,
    )

    rows = q_events_slo_burn(spark, SF_SMALL).collect()
    assert rows
    run = 0
    for r in rows:
        assert 0 <= r["errors"] <= r["n_events"]
        run += r["burn_ppm"]
        assert r["cum_burn_ppm"] == run


def test_sampling_plan_rates_and_epochs(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        _PLAN_SHARES_PPM,
        q_doc_sampling_plan,
    )

    rows = q_doc_sampling_plan(spark, SF_SMALL).collect()
    assert {r["lang"] for r in rows} <= set(_PLAN_SHARES_PPM) | {"unknown"}
    for r in rows:
        assert 0 < r["rate_ppm"] <= 1_000_000
        if r["tokens"] >= r["target_tokens"]:
            assert r["rate_ppm"] == r["target_tokens"] * 1_000_000 // r["tokens"]
        else:
            assert r["rate_ppm"] == 1_000_000
            assert r["centi_epochs"] >= 100  # repetition territory


def test_abc_xyz_partitions_all_parts(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_abc_xyz,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_parts_abc_xyz(spark, SF_SMALL).collect()
    assert rows
    n_parts = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    by_abc: dict[str, int] = {}
    for r in rows:
        assert r["abc_class"] in {"A", "B", "C"}
        assert r["xyz_class"] in {"X", "Y", "Z"}
        by_abc[r["abc_class"]] = by_abc.get(r["abc_class"], 0) + r["n_parts"]
    # rank-decile classes: A ~= 10%, B ~= 20% of parts
    assert abs(by_abc.get("A", 0) - n_parts // 10) <= 1
    assert abs(by_abc.get("B", 0) - n_parts * 2 // 10) <= 2
