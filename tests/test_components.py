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


# ---- k-core (operators/kcore.py) -------------------------------------------

def test_kcore_clique_plus_tendril(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.operators.kcore import kcore

    # K4 on {1,2,3,4} plus a path 4-5-6: the 3-core is exactly the K4
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = {r["node"]: r["deg"] for r in kcore(df, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_peel(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.operators.kcore import kcore

    # a chain has no 2-core; a cycle IS its own 2-core
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    assert kcore(chain, k=2).count() == 0
    cycle = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    out = {r["node"]: r["deg"] for r in kcore(cycle, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_raises_when_rounds_exhausted(spark):
    import pytest
    from crypto_price_tracker_with_etl_dashboard_spark.operators.kcore import kcore

    # a 6-node path needs 3 peel rounds for k=2; cap at 1 must raise
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], ["u", "v"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(path, k=2, max_rounds=1)
