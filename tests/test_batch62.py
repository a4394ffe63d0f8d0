"""Unit tests for batch 62: the GEMM-primary PQ encode driver row
(emb_pq_gemm — the second production batch kernel, completing the
pair the r8 verdict's ask #2 named).  Oracle equivalence is
check_oracle's job (certified tri-SF this round); these pin the plan
(the Arrow GEMM stage really runs, zero shuffles) and per-vector
code identity with the certified fold encoder."""

from __future__ import annotations

from conftest import SF_SMALL


def test_pq_gemm_codes_match_fold(spark):
    """Per-vector codes from the GEMM kernel must equal the certified
    fold encoder's on the real table."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _DIM,
        _PQ_M,
        _pq_books,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = _pq_books(spark, SF_SMALL, emb)
    fold = {
        r["vec_id"]: tuple(r["codes"])
        for r in S.pq_encode(emb, books, m=_PQ_M, dim=_DIM).collect()
    }
    gemm = {
        r["vec_id"]: tuple(r["codes"])
        for r in S.pq_encode_batch(emb, books, m=_PQ_M, dim=_DIM).collect()
    }
    assert fold == gemm and len(fold) > 0


def test_pq_gemm_plan_is_arrow_and_zero_shuffle(spark):
    """Encoding is ONE zero-shuffle scan through the Arrow GEMM stage:
    ArrowEvalPython present, no row-at-a-time Python, no joins, no
    exchange at all (codebooks are collected driver-side into the UDF
    closure — O(m*k) rows by construction)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_pq_gemm,
    )

    plan = (
        q_emb_pq_gemm(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange" not in plan


def test_pq_gemm_code_sum_roundtrip(spark):
    """code_sum uniquely encodes the m base-k codes: decoding it
    recovers exactly the fold encoder's code tuples."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _DIM,
        _PQ_K,
        _PQ_M,
        _pq_books,
        q_emb_pq_gemm,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = _pq_books(spark, SF_SMALL, emb)
    want = {
        r["vec_id"]: tuple(r["codes"])
        for r in S.pq_encode(emb, books, m=_PQ_M, dim=_DIM).collect()
    }
    for r in q_emb_pq_gemm(spark, SF_SMALL).collect():
        cs = r["code_sum"]
        decoded = tuple((cs // (_PQ_K ** s)) % _PQ_K for s in range(_PQ_M))
        assert decoded == want[r["vec_id"]]
