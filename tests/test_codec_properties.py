"""Property tests for the real stdlib media codecs: any synthesized
payload must decode back to the values a direct computation over the
pixel/sample formulas gives — across arbitrary ids (dims, stride
padding, corruption branches all vary with the id)."""

from __future__ import annotations

import io
import wave

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    bmp_decode,
    synth_bmp_bytes,
    synth_wav_bytes,
    wav_decode,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_bmp_roundtrip_matches_formula(media_id):
    d = bmp_decode(synth_bmp_bytes(media_id))
    if media_id % 97 == 0:
        assert d["width"] is None and d["sum_r"] is None
        return
    k = media_id % 251 + 1
    w = media_id % 13 + 4
    h = media_id % 7 + 4
    assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
    pix = [(x, y) for x in range(w) for y in range(h)]
    assert d["sum_r"] == sum((2 * x + 3 * y + 3 * k) % 256 for x, y in pix)
    assert d["sum_g"] == sum((3 * x + y + 2 * k) % 256 for x, y in pix)
    assert d["sum_b"] == sum((x + 2 * y + k) % 256 for x, y in pix)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_wav_roundtrip_matches_formula(media_id):
    d = wav_decode(synth_wav_bytes(media_id))
    if media_id % 97 == 0:
        assert d["sample_rate"] is None and d["rms"] is None
        return
    k = media_id % 251 + 1
    n = (media_id % 30 + 1) * 400
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (8000, 1, n)
    sq = sum(((i * k) % 256 - 128) ** 2 for i in range(n))
    assert d["rms"] == (sq / (n * 128.0 * 128.0)) ** 0.5  # bit-exact
    assert len(d["features"]) == 16


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=0, max_size=64),
)
def test_bmp_decode_never_raises_on_mutations(w, h, junk):
    """Truncations and tail mutations of a valid BMP must degrade to
    NULLs or decode — never raise."""
    blob = synth_bmp_bytes(w * 13 + h)  # any non-corrupt id
    for cut in (10, 20, 54, len(blob) - 1):
        out = bmp_decode(blob[:cut] + junk)
        assert isinstance(out, dict)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=128))
def test_codecs_never_raise_on_garbage(blob):
    assert isinstance(bmp_decode(blob), dict)
    assert isinstance(wav_decode(blob), dict)
