"""Unit tests for batch 63: the GEMM-primary MaxSim retrieval row
(emb_maxsim_gemm — the third production batch kernel, after batch
61's assignment and batch 62's PQ encode).  Oracle equivalence is
check_oracle's job (certified tri-SF this round, fold-SQL oracle
verbatim); these pin the plan (Arrow GEMM stage, single corpus scan,
no row-at-a-time Python) and result identity with the certified
fold query."""

from __future__ import annotations

from conftest import SF_SMALL


def test_maxsim_gemm_matches_fold_query(spark):
    """Full result identity with the certified interpreted-fold query
    on the real table — ranks, labels and integer ppm scores."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_maxsim_gemm,
        q_emb_maxsim_topk,
    )

    gemm = [
        (r["query_id"], r["rnk"], r["label"], r["score_ppm"])
        for r in q_emb_maxsim_gemm(spark, SF_SMALL).collect()
    ]
    fold = [
        (r["query_id"], r["rnk"], r["label"], r["score_ppm"])
        for r in q_emb_maxsim_topk(spark, SF_SMALL).collect()
    ]
    assert gemm == fold and len(gemm) > 0


def test_maxsim_gemm_plan_is_arrow_single_scan(spark):
    """The Arrow GEMM stage runs (ArrowEvalPython), nothing falls
    back to BatchEvalPython, no cartesian/SMJ, and the corpus is
    scanned exactly once (the fold query's broadcast-token crossJoin
    also scans once; the GEMM path must not regress that) — the
    generator must not be re-evaluated as a second Python stage
    (posexplode_outer discipline)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_maxsim_gemm,
    )

    plan = (
        q_emb_maxsim_gemm(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 1
