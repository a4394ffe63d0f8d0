"""Unit tests for connected components (operators/components.py) and
the plan-inspection helpers (plans/inspect.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.components import (
    connected_components,
)
from crypto_price_tracker_with_etl_dashboard_spark.plans import plan_summary
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_connected_components_two_clusters(spark):
    # chain 1-2-3-4 (diameter > 1: needs multiple propagation rounds),
    # pair 10-11, and a reversed-order edge 21->20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_plan_summary_facts(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    q = docs.filter(F.col("doc_id") < 10).select("doc_id")
    s = plan_summary(q)
    assert s["exchanges"] == 0 and s["python_stages"] == 0
    assert any("doc_id" in f for f in s["pushed_filters"])
    assert s["read_schemas"] and "doc_id" in s["read_schemas"][0]

    j = load_table(spark, SF_SMALL, "orders").join(
        F.broadcast(load_table(spark, SF_SMALL, "customer")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert plan_summary(j)["broadcast_joins"] == 1
