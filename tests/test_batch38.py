"""Unit tests for the batch-38 operators: sourcing-depth exposure,
audio clipping screen, VaR exceedance backtest, and brand share
shift.  Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_sourcing_depth_shares(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
        q_parts_sourcing_depth,
    )

    rows = q_parts_sourcing_depth(spark, SF_SMALL).collect()
    assert rows
    assert sum(r["rev_share_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["n_parts"] >= 1 and r["revenue_cents"] > 0
        assert r["sourcing"] in {"1-thin(<=20)", "2-mid(21-30)", "3-deep(31+)"}


def test_audio_clipping_matches_closed_form(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_audio_clipping,
    )

    rows = q_media_audio_clipping(spark, SF_SMALL).limit(60).collect()
    assert rows
    for r in rows:
        mid = r["media_id"]
        k = mid % 251 + 1
        n = (mid % 30 + 1) * 400
        assert r["n_samples"] == n
        expected = sum(1 for i in range(n) if (i * k) % 256 == 255)
        assert r["n_clipped"] == expected
        assert r["clip_ppm"] == r["n_clipped"] * 1_000_000 // n


def test_audio_clipping_corrupt_rows_dropped(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_audio_clipping,
    )

    ids = [r["media_id"] for r in q_media_audio_clipping(spark, SF_SMALL).collect()]
    assert ids and all(i % 97 != 0 for i in ids)


def test_var_exceedances_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_var_exceedances,
    )

    rows = q_prices_var_exceedances(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n1"] >= 1 and r["n2"] >= 1
        assert 0 <= r["exceed"] <= r["n2"]
        assert r["exceed_ppm"] == r["exceed"] * 1_000_000 // r["n2"]
        lhs = (20 * r["exceed"] - r["n2"]) ** 2 * 10000
        assert r["kupiec_reject"] == (lhs >= 729904 * r["n2"])


def test_brand_share_shift_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_parts_brand_share_shift,
    )

    rows = q_parts_brand_share_shift(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    mags = [abs(r["delta_ppm"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    for r in rows:
        assert 0 <= r["share_ppm"] <= 1_000_000
