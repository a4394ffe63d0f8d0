"""Unit tests for the batch-25 operators: image histogram kernel,
neighbor-overlap Jaccard, aging report, boilerplate screen, and
Herfindahl concentration.  Query-level equivalence vs DuckDB is the
oracle harness's job (check_oracle-certified at sf0.01 and sf0.1
this round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    IMG_HIST_BUCKETS,
    _bmp_pixel_array,
    synth_bmp_bytes,
)


def test_image_histogram_counts_every_pixel():
    import numpy as np

    blob = synth_bmp_bytes(1)
    px = _bmp_pixel_array(blob)
    assert px is not None
    h, w, _ = px.shape
    # recompute the closed form: pixel (x, y) channel values
    k = 1 % 251 + 1
    for ci, formula in (
        (2, lambda x, y: (2 * x + 3 * y + 3 * k) % 256),
        (1, lambda x, y: (3 * x + y + 2 * k) % 256),
        (0, lambda x, y: (x + 2 * y + k) % 256),
    ):
        expect = np.array(
            [[formula(x, y) for x in range(w)] for y in range(h)]
        )
        assert (px[:, :, ci] == expect).all()
    # bucketed counts partition the pixel set
    flat = px.reshape(-1, 3)
    for ci in range(3):
        counts = np.bincount(flat[:, ci] // (256 // IMG_HIST_BUCKETS),
                             minlength=IMG_HIST_BUCKETS)
        assert counts.sum() == h * w


def test_image_histogram_corrupt_blob_yields_no_pixels():
    assert _bmp_pixel_array(synth_bmp_bytes(97)) is None
    assert _bmp_pixel_array(None) is None


def test_neighbor_jaccard_bounds_and_symmetric_cap(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        _NJ_MIN_SHARED,
        q_trade_neighbor_jaccard,
    )

    rows = q_trade_neighbor_jaccard(spark, SF_SMALL).collect()
    for r in rows:
        assert r["a"] < r["b"]
        assert r["shared"] >= _NJ_MIN_SHARED
        assert r["shared"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["jaccard_ppm"] <= 1_000_000


def test_aging_report_buckets(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_aging_report,
    )

    rows = q_orders_aging_report(spark, SF_SMALL).collect()
    assert rows
    assert {r["age_bucket"] for r in rows} <= {"0-30", "31-90", "91-180", "180+"}
    for r in rows:
        assert r["n_orders"] > 0 and r["open_value_cents"] > 0


def test_boilerplate_screen_counts(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import text as TXT

    df = spark.createDataFrame(
        [
            (1, "Copyright 2024 Example Corp", "en", "s", 27),
            (2, "some ordinary text", "en", "s", 18),
            (3, "ALL RIGHTS RESERVED. click here now", "en", "s", 35),
            (4, "lorem ipsum dolor", "en", "s", 17),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(TXT, "load_table", lambda s, d, n: df)
    got = {r["marker"]: r for r in TXT.q_doc_boilerplate_screen(spark, "x").collect()}
    assert got["copyright"]["n_docs"] == 1
    assert got["all rights reserved"]["n_docs"] == 1
    assert got["click here"]["n_docs"] == 1
    assert got["lorem ipsum"]["n_docs"] == 1
    assert got["privacy policy"]["n_docs"] == 0
    assert got["copyright"]["share_ppm"] == 250_000


def test_herfindahl_bounds_and_share_dominance(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_supplier_herfindahl,
    )

    rows = q_orders_supplier_herfindahl(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # HHI is bounded by the top share (sum of squares <= max * sum)
        assert 0 < r["hhi"] <= 1_000_000
        assert r["hhi"] <= r["top_share_ppm"] + 1
        # n suppliers sharing a market floors the HHI at ~1/n
        assert r["hhi"] >= (1_000_000 // r["n_suppliers"]) - r["n_suppliers"]
