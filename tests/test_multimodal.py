"""Multimodal plumbing: binary columns + mapInPandas decode path
(deterministic fake kernel), schema shape, and frame-sample plan."""

from __future__ import annotations

import pytest

from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    HAS_PIL,
    MEDIA_SCHEMA,
    decode_media,
    fake_decode,
    frame_sample_plan,
    pil_decode,
    real_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", "image", "png", None, None, None),
        (2, b"\x89PNG-fake-bytes-2", "image", "png", None, None, None),
        (3, b"RIFF-fake-audio", "audio", "wav", None, None, 2500),
        (4, b"\x00\x00ftyp-fake-video", "video", "mp4", None, None, 3500),
        (5, None, "image", "png", None, None, None),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_media_schema_and_determinism(media):
    out = decode_media(media, decode_fn=fake_decode)
    assert out.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert len(rows[1]["features"]) == FEATURE_DIM
    # deterministic: same bytes -> same features across runs
    rows2 = {r["media_id"]: r for r in decode_media(media, decode_fn=fake_decode).collect()}
    assert rows[1]["features"] == rows2[1]["features"]
    assert rows[1]["features"] != rows[2]["features"]


def test_decode_media_null_content(media):
    rows = {r["media_id"]: r for r in decode_media(media, fake_decode).collect()}
    assert rows[5]["features"] is None
    assert rows[5]["n_bytes"] == 0


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: fallback path inactive")
def test_default_decode_falls_back_without_pil(media):
    """Codec-less container: decode_media() must still run end to end
    via the deterministic stand-in (with a warning), not fail."""
    with pytest.warns(RuntimeWarning, match="fake_decode"):
        assert real_decode(b"abc") == fake_decode(b"abc")
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(rows) == 5 and len(rows[1]["features"]) == FEATURE_DIM
    # pil_decode itself must refuse rather than silently fake
    with pytest.raises(NotImplementedError):
        pil_decode(b"abc")


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_pil_decode_real_png(media, spark):
    """Real-codec path: a generated PNG decodes to its true pixel
    dimensions and a 16-float thumbnail signature."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    out = pil_decode(png)
    assert (out["width"], out["height"]) == (7, 5)
    assert len(out["features"]) == FEATURE_DIM
    assert all(abs(f - 76 / 255.0) < 0.02 for f in out["features"])  # uniform red

    rows = [(1, png, "image", "png", None, None, None),
            (2, b"not an image", "image", "png", None, None, None)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (7, 5)
    assert got[2]["width"] is None  # corrupt blob degrades to NULLs


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row (3500 ms -> 3 frames at 0/1000/2000)
    assert {r["media_id"] for r in out} == {4}
    assert [r["offset_ms"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0,
        1000,
        2000,
    ]


def test_wav_decode_real_bytes():
    """Real WAV round-trip with stdlib wave: 8-bit and 16-bit PCM,
    header fields and exact-integer RMS; corrupt bytes degrade."""
    import io
    import math
    import wave

    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        wav_decode,
    )

    # 8-bit unsigned mono @8kHz: constant full-positive (255 -> +127)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([255] * 800))
    d = wav_decode(buf.getvalue())
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (8000, 1, 800)
    assert d["duration_ms"] == 100
    assert d["rms"] == pytest.approx(127 / 128.0)
    assert len(d["features"]) == 16

    # 16-bit signed stereo @44100: a 1000-sample alternating square wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(44100)
        frames = b"".join(
            (16384).to_bytes(2, "little", signed=True) * 2 for _ in range(1000)
        )
        w.writeframes(frames)
    d = wav_decode(buf.getvalue())
    assert (d["sample_rate"], d["n_channels"], d["n_samples"]) == (44100, 2, 1000)
    assert d["rms"] == pytest.approx(0.5)

    # corrupt payloads and None degrade to all-NULL, never raise
    assert wav_decode(b"RIFFgarbage")["sample_rate"] is None
    assert wav_decode(None)["rms"] is None


def test_real_decode_dispatches_wav():
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        real_decode,
        synth_wav_bytes,
    )

    wav = synth_wav_bytes(5)
    out = real_decode(wav, media_type="audio", fmt="wav")
    # generic DECODED_SCHEMA projection: width=sample_rate, height=channels
    assert (out["width"], out["height"]) == (8000, 1)
    assert len(out["features"]) == 16


def test_synth_audio_decode_roundtrip(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        decode_audio,
        synth_audio,
    )

    ids = spark.range(0, 100).toDF("media_id")
    got = {r["media_id"]: r for r in decode_audio(synth_audio(ids)).collect()}
    assert len(got) == 100
    assert got[0]["sample_rate"] is None      # 0 % 97 == 0 -> corrupt blob
    assert got[97]["sample_rate"] is None
    assert got[1]["sample_rate"] == 8000
    assert got[1]["n_samples"] == (1 % 30 + 1) * 400
    assert got[1]["duration_ms"] == got[1]["n_samples"] // 8
    assert 0.0 <= got[1]["rms"] <= 1.0 and len(got[1]["features"]) == 16


def test_bmp_decode_real_bytes():
    """Real BMP round-trip with the stdlib struct parser: bottom-up
    row order, 4-byte stride, top-down (negative height) variant,
    and per-row corrupt degradation.  Hand-built 2x2 image with a
    known stride so a parser that ignores padding or row order gets
    the wrong channel sums."""
    import struct

    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        bmp_decode,
    )

    # logical pixels, top-down:  (r,g,b)
    #   row 0: (10, 20, 30)  (40, 50, 60)
    #   row 1: (70, 80, 90)  (100, 110, 120)
    # stored bottom-up as BGR with stride 8 (2*3 -> pad 2 bytes)
    row1 = bytes([90, 80, 70, 120, 110, 100]) + b"\xAB\xCD"  # junk pad
    row0 = bytes([30, 20, 10, 60, 50, 40]) + b"\xEF\x01"
    data = row1 + row0  # bottom-up: last logical row first
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    d = bmp_decode(hdr + data)
    assert (d["width"], d["height"], d["n_pixels"]) == (2, 2, 4)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (220, 260, 300)

    # top-down variant (height < 0): rows arrive in logical order
    hdr_td = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    d_td = bmp_decode(hdr_td + row0 + row1)
    assert (d_td["sum_r"], d_td["sum_g"], d_td["sum_b"]) == (220, 260, 300)

    # degradation: wrong magic, truncated pixels, unsupported bpp, None
    assert bmp_decode(b"XXnothing")["width"] is None
    assert bmp_decode(hdr + data[:-5])["width"] is None
    bad_bpp = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0
    )
    assert bmp_decode(bad_bpp + data)["width"] is None
    assert bmp_decode(None)["width"] is None


def test_synth_bmp_decode_roundtrip_closed_form():
    """synth -> decode round-trip matches the closed-form channel
    sums the DuckDB oracle computes (the parity the driver certifies)."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        bmp_decode,
        synth_bmp_bytes,
    )

    for mid in (1, 5, 12, 96, 98, 255):
        k = mid % 251 + 1
        w = mid % 13 + 4
        h = mid % 7 + 4
        d = bmp_decode(synth_bmp_bytes(mid))
        assert (d["width"], d["height"]) == (w, h)
        assert d["sum_r"] == sum(
            (2 * x + 3 * y + 3 * k) % 256 for x in range(w) for y in range(h)
        )
        assert d["sum_g"] == sum(
            (3 * x + y + 2 * k) % 256 for x in range(w) for y in range(h)
        )
        assert d["sum_b"] == sum(
            (x + 2 * y + k) % 256 for x in range(w) for y in range(h)
        )
    assert bmp_decode(synth_bmp_bytes(97))["width"] is None  # corrupt id


def test_real_decode_dispatches_bmp():
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        real_decode,
        synth_bmp_bytes,
    )

    out = real_decode(synth_bmp_bytes(5), media_type="image", fmt="bmp")
    assert (out["width"], out["height"]) == (5 % 13 + 4, 5 % 7 + 4)
    assert len(out["features"]) == 16
    assert all(0.0 <= f <= 1.0 for f in out["features"])


def test_decode_media_default_dispatch_reaches_wav(spark):
    """decode_media's default path must hand media_type/format to
    real_decode — without that plumbing the WAV branch is unreachable
    and real audio bytes silently fall through to the image/fake
    decoder."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        synth_wav_bytes,
        wav_decode,
    )

    wav = synth_wav_bytes(7)
    rows = [(7, wav, "audio", "wav", None, None, None)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = decode_media(df).collect()[0]
    ref = wav_decode(wav)
    # generic projection: width <- sample_rate, height <- n_channels
    assert got["width"] == ref["sample_rate"] == 8000
    assert got["height"] == ref["n_channels"] == 1
    assert got["features"] == pytest.approx(ref["features"])


def _flat_bmp(w, h, rgb, override=None):
    """Hand-built 24-bit BMP: constant (r,g,b) everywhere except the
    optional ``override`` dict {(x, y): (r, g, b)} — top-down
    logical coordinates, stored bottom-up with 4-byte stride."""
    import struct

    r, g, b = rgb
    px = {}
    if override:
        px.update(override)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in reversed(range(h)):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            rr, gg, bb = px.get((x, y), (r, g, b))
            row += bytes([bb, gg, rr])
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    return hdr + data


def test_bmp_ahash_known_pattern_and_invariance():
    """aHash bit semantics on a hand-built image: only the bright
    block's bit is set; a uniform brightness shift leaves the hash
    unchanged (the perceptual-hash property); tiny noise in one
    pixel doesn't flip it; corrupt bytes degrade to None."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        bmp_ahash16,
    )

    # 8x8, dark everywhere except the top-left 2x2 block (block 0)
    bright = {(x, y): (250, 250, 250) for x in range(2) for y in range(2)}
    base = bmp_ahash16(_flat_bmp(8, 8, (10, 10, 10), bright))
    assert base == 1  # only bit 0 (by=0, bx=0) above the mean

    shifted = {(x, y): (254, 254, 254) for x in range(2) for y in range(2)}
    brighter = bmp_ahash16(_flat_bmp(8, 8, (14, 14, 14), shifted))
    assert brighter == base  # +4 on every channel: hash invariant

    noisy = dict(bright)
    noisy[(7, 7)] = (13, 11, 12)  # one-pixel perturbation
    assert bmp_ahash16(_flat_bmp(8, 8, (10, 10, 10), noisy)) == base

    assert bmp_ahash16(b"BMcorrupt") is None
    assert bmp_ahash16(None) is None


def test_bmp_ahash_distinguishes_structure():
    """Images with different bright regions get different hashes —
    near-dup grouping by equality separates them."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        bmp_ahash16,
    )

    tl = bmp_ahash16(_flat_bmp(8, 8, (10, 10, 10),
                               {(x, y): (250, 250, 250)
                                for x in range(4) for y in range(4)}))
    br = bmp_ahash16(_flat_bmp(8, 8, (10, 10, 10),
                               {(x, y): (250, 250, 250)
                                for x in range(4, 8) for y in range(4, 8)}))
    assert tl != br
    assert tl is not None and br is not None


def test_ahash_images_spark_path(spark):
    """The mapInPandas kernel matches the local function per row and
    degrades corrupt ids to NULL."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        ahash_images,
        bmp_ahash16,
        synth_bmp_bytes,
        synth_images,
    )

    ids = spark.createDataFrame([(i,) for i in (1, 2, 97, 388)], ["media_id"])
    out = {
        r["media_id"]: r["ahash"]
        for r in ahash_images(synth_images(ids)).collect()
    }
    for i in (1, 2, 388):
        assert out[i] == bmp_ahash16(synth_bmp_bytes(i))
    assert out[97] is None  # corrupt id degrades per row


def test_wav_loudness_stats_closed_form():
    """The loudness kernel's integers must equal the synthesis
    closed form: samples of blob k are (i*k) % 256, deviations taken
    from the 128 midpoint."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        synth_wav_bytes,
        wav_loudness_stats,
    )

    mid = 5
    n, ssq, peak = wav_loudness_stats(synth_wav_bytes(mid))
    k, exp_n = mid % 251 + 1, (mid % 30 + 1) * 400
    devs = [((i * k) % 256) - 128 for i in range(exp_n)]
    assert n == exp_n
    assert ssq == sum(d * d for d in devs)
    assert peak == max(abs(d) for d in devs)
    # corrupt / undecodable payloads degrade to NULLs, same contract
    # as wav_clip_stats
    assert wav_loudness_stats(None) == (None, None, None)
    assert wav_loudness_stats(b"not a wav") == (None, None, None)
