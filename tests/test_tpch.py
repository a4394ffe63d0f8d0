"""TPC-H-adapted query suite (queries/tpch.py): row-level sanity at
sf0.001 plus plan-shape pins for the scale-critical properties
(dimension broadcasts, agg-before-join reduction).  Full value
correctness runs through the DuckDB oracle gate."""

from __future__ import annotations

import pytest

from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES
from tests.conftest import SF_SMALL

TPCH_NAMES = [
    "q2_min_cost_supplier",
    "q12_delay_priority",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q20_heavy_shippers",
    "q21_last_shipper",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q22_idle_balance",
]


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", TPCH_NAMES)
def test_runs_and_returns_rows(spark, name):
    # q7's two-nation filter keeps ~2/625 of pairs — empty at sf0.001,
    # so it runs against sf0.01 (where the oracle gate also checks it).
    sf = "/root/testdata/sf0.01" if name == "q7_volume_shipping" else SF_SMALL
    rows = SPARK_QUERIES[name](spark, sf).collect()
    # q19's triple-disjunction selects nothing at sf0.001 (a single
    # global aggregate row is still produced); all others must hit.
    if name == "q19_disjunctive_revenue":
        assert len(rows) == 1
    else:
        assert len(rows) > 0


def test_q8_share_bounded(spark):
    for r in SPARK_QUERIES["q8_market_share"](spark, SF_SMALL).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_q10_descending_revenue_order(spark):
    revs = [r["revenue"] for r in SPARK_QUERIES["q10_returned_items"](spark, SF_SMALL).collect()]
    assert revs == sorted(revs, reverse=True)


def test_q7_dims_broadcast_no_sort_merge(spark):
    plan = plan_of(SPARK_QUERIES["q7_volume_shipping"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # only the lineitem-orders join may shuffle; dims never sort-merge
    assert plan.count("SortMergeJoin") <= 1


def test_q18_semi_reduction_before_join(spark):
    # the lineitem aggregate must feed the BROADCAST side (aggregated
    # orderkeys, not raw lineitem): in the top-down plan print the
    # first BroadcastExchange subtree contains the HashAggregate, and
    # the only hash-partition shuffle is the lineitem aggregation.
    plan = plan_of(SPARK_QUERIES["q18_large_volume"](spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert plan.index("BroadcastExchange") < plan.index("HashAggregate")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q4_semi_join_not_nested_loop(spark):
    plan = plan_of(SPARK_QUERIES["q4_order_priority"](spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
