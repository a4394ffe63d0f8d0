"""Unit tests for the batch-23 operators: frame-energy audio VAD
(sources/multimodal.py::vad_profile), Donchian breakouts, degree
assortativity, readability, and kNN-density outliers.  Query-level
equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_SMALL

from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    VAD_FRAME_LEN,
    _wav_frame_profile,
    synth_wav_bytes,
)


def test_vad_profile_hand_computed_frames():
    # media_id 1: k=2, n=800 -> exactly 2 frames of 400 samples
    blob = synth_wav_bytes(1)
    p = _wav_frame_profile(blob, VAD_FRAME_LEN, low_mean_sq=5400)
    assert p["n_frames"] == 2
    # recompute frame sums from the closed form
    sums = []
    for f in range(2):
        s = sum(
            ((i * 2) % 256 - 128) ** 2 for i in range(f * 400, (f + 1) * 400)
        )
        sums.append(s)
    assert p["low_frames"] == sum(1 for s in sums if s < 5400 * 400)
    assert p["peak_rms_ppm"] == int(
        math.sqrt(max(sums) / (400 * 16384.0)) * 1000000.0
    )
    assert p["min_rms_ppm"] == int(
        math.sqrt(min(sums) / (400 * 16384.0)) * 1000000.0
    )


def test_vad_profile_corrupt_blob_degrades_to_nulls():
    p = _wav_frame_profile(synth_wav_bytes(97), VAD_FRAME_LEN, 5400)
    assert p["n_frames"] is None and p["peak_rms_ppm"] is None
    p2 = _wav_frame_profile(None, VAD_FRAME_LEN, 5400)
    assert p2["n_frames"] is None


def test_vad_partial_trailing_frame_is_dropped():
    # a blob whose sample count is not a frame multiple: frames = floor
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(np.full(950, 128, dtype=np.uint8).tobytes())
    p = _wav_frame_profile(buf.getvalue(), VAD_FRAME_LEN, 5400)
    assert p["n_frames"] == 2  # 950 // 400, the trailing 150 dropped
    assert p["low_frames"] == 2  # constant-128 samples center to 0
    assert p["peak_rms_ppm"] == 0


def test_donchian_breakouts_are_consistent(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_donchian,
    )

    rows = q_prices_donchian(spark, SF_SMALL).collect()
    assert rows, "expected per-symbol channel stats"
    for r in rows:
        assert 0 <= r["breakouts_up"] <= r["n_evals"]
        assert 0 <= r["breakouts_down"] <= r["n_evals"]
        assert r["max_width_ppm"] >= 0


def test_assortativity_is_a_correlation(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.graph import (
        q_trade_assortativity,
    )

    (r,) = q_trade_assortativity(spark, SF_SMALL).collect()
    assert r["M"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0
    # mirrored edge list: the two marginals are identical
    assert r["Sx"] == r["Sy"]


def test_readability_bounds_and_counts(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_readability,
    )

    rows = q_doc_readability(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["words"] > 0 and r["sentences"] >= 1
        # flesch = 206.835 - 1.015*w/s - 84.6*syl/w, floored to milli
        expect = math.floor(
            (
                206.835
                - 1.015 * (r["words"] / r["sentences"])
                - 84.6 * (r["syllables"] / r["words"])
            )
            * 1000.0
        )
        assert r["flesch_milli"] == expect


def test_knn_outliers_k_and_range(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _KNN_OUT_K,
        q_emb_knn_outliers,
    )

    rows = q_emb_knn_outliers(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["k_used"] <= _KNN_OUT_K
        assert -1_000_000 <= r["knn_mean_sim_ppm"] <= 1_000_000
