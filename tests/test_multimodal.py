"""Multimodal plumbing: binary columns + mapInPandas decode path
(deterministic fake kernel), schema shape, and frame-sample plan."""

from __future__ import annotations

import pytest

from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    fake_decode,
    frame_sample_plan,
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


def test_real_decoder_is_explicitly_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        decode_media(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or "not installed" in str(exc_info.value)


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row (3500 ms -> 3 frames at 0/1000/2000)
    assert {r["media_id"] for r in out} == {4}
    assert [r["offset_ms"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0,
        1000,
        2000,
    ]
