"""Unit tests for batch 61: the GEMM-primary k-means assignment
driver row (emb_kmeans_gemm — r8 verdict ask #2).  Oracle equivalence
is check_oracle's job (certified at sf0.001/sf0.01/sf0.1 this round);
these pin the invariants that make the row meaningful: the executed
plan really runs the Arrow GEMM stage (not the interpreted fold), the
assignments agree with the certified fold path, and the rollup stays
shuffle-minimal.
"""

from __future__ import annotations

from conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_gemm_matches_fold_assignments(spark):
    """Per-vector assignments from the GEMM primary path must equal
    the certified fold's on the real table — the end-to-end identity
    the driver row asserts in aggregate (same audit as emb_gemm_audit
    but through the registered query's own centroid pipeline)."""
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _DIM,
        _KM_K,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    seeds = (
        emb.orderBy(F.col("vec_id").asc())
        .limit(_KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
    )
    cents = S.kmeans_update(
        S.kmeans_assign(emb, seeds, _DIM)
    ).localCheckpoint(eager=True)
    fold = {
        r["vec_id"]: r["cid"]
        for r in S.kmeans_assign(emb, cents, _DIM).collect()
    }
    gemm = {
        r["vec_id"]: r["cid"]
        for r in S.kmeans_assign_batch(emb, cents).collect()
    }
    assert fold == gemm and len(fold) > 0


def test_kmeans_gemm_plan_is_arrow_and_shuffle_minimal(spark):
    """The registered query's executed plan must contain the Arrow
    GEMM stage (ArrowEvalPython — the whole point of the driver row)
    and no BatchEvalPython (row-at-a-time Python), no
    CartesianProduct, no SortMergeJoin; the only join is the fold
    path's broadcast centroid attach inside centroid TRAINING, and
    the scoring scan itself is join-free."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_kmeans_gemm,
    )

    plan = _executed_plan(q_emb_kmeans_gemm(spark, SF_SMALL))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_gemm_output_shape(spark):
    """k rows (every centroid keeps members at this SF), disjoint
    exhaustive membership: counts sum to the table size, min <= max
    per cluster, fingerprints consistent with membership counts."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _KM_K,
        q_emb_kmeans_gemm,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_emb_kmeans_gemm(spark, SF_SMALL).collect()
    assert len(rows) == _KM_K
    n = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert r["min_vec_id"] <= r["max_vec_id"]
        assert 0 <= r["id_fingerprint"] < r["n_members"] * 1000003
