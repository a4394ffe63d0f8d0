"""Unit tests for the batch-59 operators: LSH band-bucket profile,
overnight-vs-intraday return decomposition, realized-volatility
signature, and the PQ per-subspace distortion audit.  Oracle
equivalence is check_oracle's job (certified at sf0.01 and sf0.1 this
round); these pin shapes and invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_lsh_bucket_profile_consistency(spark):
    """Per-band bucket accounting must reconcile: every band holds the
    same banded-doc population, pair bills are non-negative, and the
    over-ceiling count is zero at test SF (the guard sits ~8x above
    the observed max bucket)."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        MAX_BAND_BUCKET,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        _BANDS,
        q_doc_lsh_bucket_profile,
    )

    rows = q_doc_lsh_bucket_profile(spark, SF_SMALL).collect()
    assert [r["band_idx"] for r in rows] == list(range(_BANDS))
    docs_per_band = {r["n_docs"] for r in rows}
    assert len(docs_per_band) == 1  # every band bands every doc once
    for r in rows:
        assert 1 <= r["max_bucket"] <= MAX_BAND_BUCKET
        assert r["n_buckets"] <= r["n_docs"]
        assert r["candidate_pairs"] >= r["max_bucket"] * (r["max_bucket"] - 1) // 2
        assert r["n_over_ceiling"] == 0


def test_overnight_intraday_identities(spark):
    """Return legs are clamped ppm integers; dominant-day counts are
    bounded by n_days; symbols with < 2 trading days are absent."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_overnight_intraday,
    )

    rows = q_prices_overnight_intraday(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 1
        assert -1_000_000 <= r["overnight_mean_ppm"] <= 1_000_000
        assert -1_000_000 <= r["intraday_mean_ppm"] <= 1_000_000
        assert 0 <= r["overnight_dominant_days"] <= r["n_days"]


def test_vol_signature_scales_and_bounds(spark):
    """Each symbol reports every scale it has >= 2 non-empty buckets
    for; coarser scales can only have fewer return observations; rv is
    bounded by n_obs * max_r^2."""
    import collections

    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        _SIG_SCALES,
        q_prices_vol_signature,
    )

    rows = q_prices_vol_signature(spark, SF_SMALL).collect()
    assert rows
    by_sym = collections.defaultdict(dict)
    for r in rows:
        assert r["scale"] in _SIG_SCALES
        assert r["n_obs"] >= 1
        assert 0 <= r["rv_ppm2"] <= r["n_obs"] * 10**12
        assert 0 <= r["mean_abs_ppm"] <= 10**6
        by_sym[r["symbol"]][r["scale"]] = r["n_obs"]
    for scales in by_sym.values():
        seen = sorted(scales)
        # a coarser grid never yields MORE return observations
        for a, b in zip(seen, seen[1:]):
            assert scales[b] <= scales[a]


def test_pq_subspace_distortion_shares(spark):
    """m rows, one per subspace; shares are floor-ppm of an exact
    integer total (sum within one floor step of 1e6); every vector is
    encoded in every subspace."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _PQ_M,
        q_emb_pq_subspace_distortion,
    )

    rows = q_emb_pq_subspace_distortion(spark, SF_SMALL).collect()
    assert [r["subspace"] for r in rows] == list(range(_PQ_M))
    assert len({r["n_vecs"] for r in rows}) == 1
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - _PQ_M < total_share <= 1_000_000
    for r in rows:
        assert 0 <= r["mean_micro"] <= r["max_micro"]


def test_batch59_plan_pins(spark):
    """The bucket profile is the banding map + ONE band-key exchange
    (+ the 8-row rollup); the signature never cartesians the scale
    explode; the PQ encode stays a zero-shuffle broadcast fold (its
    only exchanges belong to codebook training and the 4-row agg)."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_vol_signature,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_lsh_bucket_profile,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_pq_subspace_distortion,
    )

    bplan = (
        q_doc_lsh_bucket_profile(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in bplan
    assert "SortMergeJoin" not in bplan

    splan = (
        q_prices_vol_signature(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in splan
    assert "SortMergeJoin" not in splan

    pplan = (
        q_emb_pq_subspace_distortion(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in pplan
    assert "SortMergeJoin" not in pplan
