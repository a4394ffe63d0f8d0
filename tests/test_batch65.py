"""Unit tests for batch 65: k-truss peeling (events_ktruss) and the
IDF-weighted Jaccard rescoring (doc_idf_weighted_jaccard).  Oracle
equivalence is check_oracle's job (certified tri-SF this round);
these pin hand-computed peel semantics, score invariants, and plan
shape."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.ktruss import ktruss


@pytest.fixture()
def bowtie(spark):
    # two triangles sharing edge (2,3), plus a pendant edge (4,5):
    # supports are hand-computable — (2,3)=2, the four wing edges =1,
    # (4,5)=0
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    return spark.createDataFrame(edges, ["u", "v"])


def test_ktruss_hand_computed_peel(spark, bowtie):
    """k=3: round 1 peels only the triangle-free pendant; round 2
    re-measures the unchanged remainder.  Every survivor reports the
    support that justified it."""
    rows = {(r.u, r.v): r.support for r in ktruss(bowtie, k=3, rounds=2).collect()}
    assert rows == {(1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1}


def test_ktruss_k4_collapses_to_empty(spark, bowtie):
    """k=4 needs support >= 2: round 1 keeps only (2,3), which alone
    closes no triangle — round 2 empties the graph (the fixed-round
    peel reaches the true 4-truss here)."""
    assert ktruss(bowtie, k=4, rounds=2).count() == 0


def test_ktruss_survivors_meet_threshold_and_subset(spark, bowtie):
    out = ktruss(bowtie, k=3, rounds=1).collect()
    edges = {(u, v) for u, v in [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]}
    for r in out:
        assert r.support >= 1  # k - 2
        assert (r.u, r.v) in edges  # u < v keying preserved


def test_ktruss_max_degree_guard(spark, bowtie):
    """The celebrity cap peels on the subgraph induced by nodes with
    full-graph degree <= cap: capping at 2 drops nodes 2, 3, 4
    (degrees 3/3/3) and with them every triangle — empty output —
    while a non-binding cap changes nothing."""
    assert ktruss(bowtie, k=3, rounds=1, max_degree=2).count() == 0
    capped = sorted(
        (r.u, r.v, r.support)
        for r in ktruss(bowtie, k=3, rounds=2, max_degree=100).collect()
    )
    uncapped = sorted(
        (r.u, r.v, r.support) for r in ktruss(bowtie, k=3, rounds=2).collect()
    )
    assert capped == uncapped


def test_ktruss_validates_inputs(spark, bowtie):
    with pytest.raises(ValueError, match="k must be >= 3"):
        ktruss(bowtie, k=2)
    with pytest.raises(ValueError, match="rounds must be >= 1"):
        ktruss(bowtie, rounds=0)


def test_idf_jaccard_invariants(spark):
    """Scores sit on the ppm grid within (threshold, 1e6]; pairs are
    id-ordered; intersection weight is positive (a pair only exists
    through a shared shingle)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["doc_idf_weighted_jaccard"](spark, SF_SMALL).collect()
    assert rows  # the sf0.001 corpus has planted near-dups
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.inter_w > 0
        assert 100_000 <= r.wj_ppm <= 1_000_000


def test_idf_jaccard_weighting_beats_flat_on_rare_overlap(spark):
    """The defining property of the rescoring: a pair sharing RARE
    shingles outranks a pair sharing the same NUMBER of common
    shingles.  Built synthetically: docs A/B share a unique passage,
    C/D share a boilerplate passage that also floods 20 other docs."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_idf_weighted_jaccard,
    )

    rare = "quantum ledger anomaly detected in sector seven today"
    boiler = "all rights reserved contact us terms of service apply"
    docs = [(1, rare + " alpha beta gamma", "en"),
            (2, rare + " delta epsilon zeta", "en"),
            (3, boiler + " alpha beta gamma", "en"),
            (4, boiler + " delta epsilon zeta", "en")]
    docs += [(10 + i, boiler + f" filler{i} pad{i} noise{i}", "en") for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])

    import crypto_price_tracker_with_etl_dashboard_spark.queries.text as tq

    orig = tq.load_table
    tq.load_table = lambda s, d, t: df
    try:
        rows = {(r.doc_a, r.doc_b): r.wj_ppm
                for r in q_doc_idf_weighted_jaccard(spark, SF_SMALL).collect()}
    finally:
        tq.load_table = orig
    assert rows[(1, 2)] > rows.get((3, 4), 0)


def test_batch65_plans_no_cartesian_no_row_python(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    for name in ("events_ktruss", "doc_idf_weighted_jaccard"):
        plan = (
            SPARK_QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
