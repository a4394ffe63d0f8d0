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


def test_path_graph_converges_in_log_rounds(spark):
    """Adversarial high-diameter graph: a 1024-node path.  Pure
    propagation needs 1023 rounds; with 3 adaptive plain rounds then
    pointer jumping (covered distance doubles per round: 3, then
    7/15/.../1023 after 8 jump rounds) it must finish within 12
    (11 + one no-change round).  max_iterations=13 makes the O(log n)
    bound a hard failure, not a benchmark observation."""
    n = 1024
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = connected_components(edges, max_iterations=13).collect()
    assert len(got) == n
    assert all(r["component"] == 0 for r in got)


def test_unconverged_raises_instead_of_partial_labels(spark):
    """Exhausting max_iterations must fail loudly — partial labels
    split one true component into several and a dedup caller would
    keep multiple 'canonical' docs per cluster."""
    import pytest

    # a path 0-1-2-...-9 with jumping disabled needs ~9 propagation
    # rounds; 3 rounds cannot converge it
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=3, shortcut=False)
