"""Unit tests for batch 64: the text x embedding consensus dedup
(doc_emb_consensus_dedup) and the broadcast-guard observability row
(events_graph_broadcast_audit).  Oracle equivalence is check_oracle's
job (certified tri-SF this round); these pin plan shape and the
cross-channel invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_consensus_pairs_are_exactly_the_lsh_pairs(spark):
    """The consensus query scores the certified LSH candidate set —
    no pair appears or disappears through the embedding joins.  Since
    r10 ADVICE the attaches are LEFT joins, so losslessness is
    structural (a missing embedding keeps the pair with cos_ppm NULL
    and consensus 0) rather than resting on doc_id/vec_id alignment."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    lsh = {
        (r.doc_a, r.doc_b)
        for r in SPARK_QUERIES["doc_minhash_lsh"](spark, SF_SMALL).collect()
    }
    rows = SPARK_QUERIES["doc_emb_consensus_dedup"](spark, SF_SMALL).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == lsh and len(rows) == len(lsh)


def test_consensus_flag_and_cos_ppm_invariants(spark):
    """cos_ppm sits on the certified ppm grid (|cos| <= 1 -> |ppm| <=
    1e6) and the consensus bit is exactly the conjunction of the two
    documented thresholds."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _CONSENSUS_COS_PPM,
        _CONSENSUS_JACCARD,
    )

    rows = SPARK_QUERIES["doc_emb_consensus_dedup"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.cos_ppm <= 1_000_000
        want = int(
            r.est_jaccard >= _CONSENSUS_JACCARD
            and r.cos_ppm >= _CONSENSUS_COS_PPM
        )
        assert r.consensus == want


def test_consensus_plan_no_cartesian_no_row_python(spark):
    """The pair cosine is JVM-side array arithmetic: the only Python
    in the plan is the minhash signature Arrow kernel; joins are
    equi-joins (no CartesianProduct anywhere)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    plan = (
        SPARK_QUERIES["doc_emb_consensus_dedup"](spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python forbidden


def test_broadcast_audit_row_matches_guard_reality(spark):
    """The observability row reports BOTH guard regimes: hint_fits
    (exact count, the PageRank decision) and bound_fits (the free
    2*|edges| upper bound LPA/HITS/modularity actually pass)."""
    from crypto_price_tracker_with_etl_dashboard_spark.operators._broadcast_guard import (
        MAX_BROADCAST_NODES,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["events_graph_broadcast_audit"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.broadcast_limit == MAX_BROADCAST_NODES
    assert 0 < r.n_nodes <= 2 * r.n_edges  # each edge names <= 2 new nodes
    assert r.hint_fits == int(r.n_nodes <= MAX_BROADCAST_NODES) == 1
    assert r.bound_fits == int(2 * r.n_edges <= MAX_BROADCAST_NODES) == 1


def test_broadcast_audit_divergent_band_matches_guarded_rounds(
    spark, monkeypatch
):
    """In the band n_nodes <= limit < 2*|edges| the two audit columns
    diverge (hint_fits=1, bound_fits=0) and every bound-guarded LPA
    round really does drop the hint — the audit's bound_fits column,
    not hint_fits, is the one that predicts the iterative family's
    decision there (r10 ADVICE)."""
    from crypto_price_tracker_with_etl_dashboard_spark.operators import (
        _broadcast_guard as bg,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES

    base = SPARK_QUERIES["events_graph_broadcast_audit"](spark, SF_SMALL).collect()[0]
    assert base.n_nodes < 2 * base.n_edges  # the band exists for this graph

    monkeypatch.setattr(bg, "MAX_BROADCAST_NODES", int(base.n_nodes))
    r = SPARK_QUERIES["events_graph_broadcast_audit"](spark, SF_SMALL).collect()[0]
    assert (r.hint_fits, r.bound_fits) == (1, 0)

    bg.clear_guard_log(spark)
    SPARK_QUERIES["events_communities"](spark, SF_SMALL).collect()
    lpa = [d for d in bg.guard_log(spark) if d["op"] == "lpa"]
    assert lpa and all(not d["hinted"] for d in lpa)  # agrees with bound_fits=0
    assert all(d["n_nodes"] == 2 * base.n_edges for d in lpa)  # the free bound
