"""Multimodal columns: image/audio/video as opaque ``binary``
payloads plus typed metadata structs, processed with Arrow-batched
``mapInPandas`` (the only operators in this engine that leave the
JVM, because codec work is inherently Python/native-library work).

Design for 100 TB: the binary column never moves through a shuffle —
decode/feature-extract are narrow map stages over the source
partitions; only the (small) extracted features flow onward.  Batch
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so executor memory stays flat regardless of blob sizes.

The decode kernel is pluggable: ``pil_decode`` is a REAL image
decoder used automatically when Pillow is importable; in containers
without codec libraries (like this one) ``decode_media`` falls back
to the deterministic ``fake_decode`` stand-in with a warning.  The
Spark-side plumbing — schemas, UDF signatures, Arrow batching,
partition behavior — is identical either way, real and tested.
"""

from __future__ import annotations

import hashlib
import warnings
from typing import Callable, Iterator, Optional

import numpy as np

try:  # optional codec dependency — absent in this container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAS_PIL = False

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("format", StringType(), True),      # png|jpg|wav|mp4...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: derives
    pseudo-dimensions and a FEATURE_DIM-float signature from the md5
    of the payload.  Replace with a PIL/torchvision kernel in a real
    deployment."""
    if content is None:
        return {"width": None, "height": None, "features": None}
    digest = hashlib.md5(content).digest()
    feats = [b / 255.0 for b in digest[:FEATURE_DIM]]
    return {
        "width": 1 + digest[0],
        "height": 1 + digest[1],
        "features": feats,
    }


def pil_decode(content: bytes) -> dict:
    """Real image decoder (requires Pillow): actual pixel dimensions
    plus a FEATURE_DIM-float signature — the 4x4 grayscale thumbnail,
    the standard cheap perceptual feature.  Undecodable payloads
    (truncated files, non-image bytes) degrade to NULLs per row
    instead of failing the task — at corpus scale some blobs are
    always corrupt."""
    if content is None:
        return {"width": None, "height": None, "features": None}
    if not HAS_PIL:
        raise NotImplementedError(
            "Pillow is not installed; pass decode_fn=fake_decode or a custom kernel"
        )
    import io

    try:
        img = _PILImage.open(io.BytesIO(content))
        img.load()
    except Exception:
        return {"width": None, "height": None, "features": None}
    width, height = img.size
    thumb = img.convert("L").resize((4, 4))  # 16 px = FEATURE_DIM
    feats = [p / 255.0 for p in thumb.getdata()]
    return {"width": width, "height": height, "features": feats}


def wav_decode(content: bytes) -> dict:
    """Real audio decoder for WAV payloads — stdlib ``wave`` only, no
    new dependency.  Returns sample_rate / n_channels / n_samples /
    duration_ms / rms plus a FEATURE_DIM-float energy envelope (RMS
    per equal time slice, the cheap standard audio feature).  The RMS
    is computed from the EXACT integer sum of squared centered
    samples, then one float divide+sqrt — so any engine (or the
    DuckDB oracle) reproducing the same integers gets a bit-identical
    double.  Undecodable payloads degrade to all-NULL rows like
    ``pil_decode`` — at corpus scale some blobs are always corrupt."""
    import io
    import wave

    null = {
        "sample_rate": None, "n_channels": None, "n_samples": None,
        "duration_ms": None, "rms": None, "features": None,
    }
    if content is None:
        return null
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
            n = w.getnframes()
            raw = w.readframes(n)
    except Exception:
        return null
    if width == 1:  # unsigned 8-bit PCM, center 128
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        full = 128.0
    elif width == 2:  # signed 16-bit little-endian PCM
        samples = np.frombuffer(
            raw[: (len(raw) // 2) * 2], dtype="<i2"
        ).astype(np.int64)
        full = 32768.0
    else:
        return null
    m = len(samples)
    if m == 0:
        return {
            "sample_rate": rate, "n_channels": nch, "n_samples": 0,
            "duration_ms": 0, "rms": 0.0,
            "features": [0.0] * FEATURE_DIM,
        }
    # int64 squares stay exact (16-bit worst case: 2^30 per sample,
    # ~2^44 summed over any realistic clip — far from overflow); the
    # sums are converted back to Python ints so the final
    # divide+sqrt is the identical pure-Python float expression the
    # closed-form oracle reproduces bit-for-bit.
    sq_prefix = np.concatenate(([0], np.cumsum(samples * samples)))
    sq = int(sq_prefix[m])
    rms = (sq / (m * full * full)) ** 0.5
    # energy envelope: RMS per FEATURE_DIM equal slices
    feats = []
    per = max(1, m // FEATURE_DIM)
    for i in range(FEATURE_DIM):
        lo, hi = i * per, min((i + 1) * per, m)
        if lo >= m:  # slice past the end -> silent
            feats.append(0.0)
        else:
            ssq = int(sq_prefix[hi] - sq_prefix[lo])
            feats.append((ssq / ((hi - lo) * full * full)) ** 0.5)
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_samples": n,
        "duration_ms": n * 1000 // rate if rate else None,
        "rms": float(rms),
        "features": feats,
    }


BMP_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
    ]
)


def bmp_decode(content: bytes) -> dict:
    """REAL image decoder for uncompressed 24-bit BMP payloads —
    stdlib ``struct`` + numpy only, no codec library.  Parses the
    BITMAPFILEHEADER/BITMAPINFOHEADER, honors the 4-byte row stride
    and bottom-up row order (top-down when height < 0), and reduces
    the pixel array to exact-integer per-channel sums — the closed
    form a DuckDB oracle reproduces from the synthesis formula
    without any BMP parsing.  Undecodable payloads (truncated files,
    wrong magic, unsupported bpp/compression) degrade to all-NULL
    rows per row, like ``pil_decode``/``wav_decode``."""
    import struct

    null = {
        "width": None, "height": None, "n_pixels": None,
        "sum_r": None, "sum_g": None, "sum_b": None,
    }
    if content is None or len(content) < 54 or content[:2] != b"BM":
        return null
    (offset,) = struct.unpack_from("<I", content, 10)
    hdrsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if hdrsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return null
    top_down, habs = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(content) < offset + stride * habs:
        return null
    px = (
        np.frombuffer(content, dtype=np.uint8, count=stride * habs, offset=offset)
        .reshape(habs, stride)[:, : w * 3]
        .reshape(habs, w, 3)
    )
    if not top_down:
        px = px[::-1]  # stored bottom-up -> logical top-down
    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)  # B, G, R order
    return {
        "width": w, "height": habs, "n_pixels": w * habs,
        "sum_r": int(sums[2]), "sum_g": int(sums[1]), "sum_b": int(sums[0]),
    }


def synth_bmp_bytes(media_id: int) -> Optional[bytes]:
    """Deterministic REAL BMP payload (24-bit uncompressed,
    bottom-up, 4-byte row stride) whose pixel (x, y) channels are the
    closed form the oracle reproduces without parsing BMP:

        b = (x + 2*y + k)     % 256
        g = (3*x + y + 2*k)   % 256
        r = (2*x + 3*y + 3*k) % 256,   k = media_id % 251 + 1

    with width = media_id % 13 + 4 and height = media_id % 7 + 4.
    Ids divisible by 97 yield a truncated/corrupt blob to exercise
    per-row decoder degradation on the certified path."""
    if media_id % 97 == 0:
        return b"BMcorrupt-not-a-bmp"
    import struct

    k = media_id % 251 + 1
    w = media_id % 13 + 4
    h = media_id % 7 + 4
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    bgr = np.stack(
        [
            (xs + 2 * ys + k) % 256,
            (3 * xs + ys + 2 * k) % 256,
            (2 * xs + 3 * ys + 3 * k) % 256,
        ],
        axis=2,
    ).astype(np.uint8)  # (h, w, 3) in B,G,R channel order
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr[::-1].reshape(h, w * 3)  # bottom-up rows
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def synth_images(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Image media table with real BMP binary content, Arrow-batched
    (same shape as ``synth_audio``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": [synth_bmp_bytes(int(i)) for i in pdf[id_col]],
                    "media_type": "image",
                    "format": "bmp",
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("media_type", StringType(), True),
            StructField("format", StringType(), True),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(kernel, schema)


def decode_images(media: DataFrame) -> DataFrame:
    """BMP decode via mapInPandas (narrow map, binary dropped after
    decode); kernel = stdlib ``bmp_decode``, per-row corrupt
    degradation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [bmp_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{
                        f: [d[f] for d in decoded]
                        for f in ("width", "height", "n_pixels",
                                  "sum_r", "sum_g", "sum_b")
                    },
                }
            )

    return media.mapInPandas(kernel, BMP_DECODED_SCHEMA)


def real_decode(content: bytes, media_type: str | None = None,
                fmt: str | None = None) -> dict:
    """The production decoder, dispatching on media type/format:
    WAV audio -> ``wav_decode`` (stdlib, always real); images ->
    ``pil_decode`` when Pillow is importable; everything else (and
    images in codec-less containers) -> the deterministic
    ``fake_decode`` stand-in (one warning per process) so pipelines
    stay runnable anywhere."""
    if fmt == "wav" or (media_type == "audio" and fmt in (None, "wav")):
        d = wav_decode(content)
        # project into the generic DECODED_SCHEMA shape
        return {"width": d["sample_rate"], "height": d["n_channels"],
                "features": d["features"]}
    if fmt == "bmp":  # real stdlib pixel decode, no codec library
        d = bmp_decode(content)
        if d["width"] is None:
            return {"width": None, "height": None, "features": None}
        n255 = d["n_pixels"] * 255.0
        feats = [d["sum_r"] / n255, d["sum_g"] / n255, d["sum_b"] / n255]
        return {"width": d["width"], "height": d["height"],
                "features": feats + [0.0] * (FEATURE_DIM - len(feats))}
    if media_type in (None, "image") and HAS_PIL:
        return pil_decode(content)
    if media_type in (None, "image"):
        warnings.warn(
            "Pillow not installed: decode_media falling back to fake_decode "
            "(deterministic stand-in features, not real pixels)",
            RuntimeWarning,
            stacklevel=2,
        )
    return fake_decode(content)


def decode_media(
    media: DataFrame,
    decode_fn: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.  One Arrow batch in,
    one out; the binary column is dropped after decoding so only
    small typed outputs continue through the plan.

    The default decoder is :func:`real_decode`, which dispatches on
    the row's ``media_type``/``format`` columns when the input table
    carries them (WAV -> stdlib wav_decode, BMP -> stdlib bmp_decode,
    other images -> Pillow/fake fallback).  Without this plumbing the
    dispatcher's typed branches are unreachable and real WAV/BMP
    bytes would silently fall through to the wrong decoder.  A custom
    ``decode_fn`` keeps the plain 1-arg ``bytes -> dict`` contract."""
    if decode_fn is None:
        dispatch = real_decode
    else:
        def dispatch(content, media_type=None, fmt=None):  # noqa: ARG001
            return decode_fn(content)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mts = pdf["media_type"] if "media_type" in pdf.columns else [None] * n
            fmts = pdf["format"] if "format" in pdf.columns else [None] * n
            decoded = [
                dispatch(c, mt, f)
                for c, mt, f in zip(pdf["content"], mts, fmts)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.mapInPandas(kernel, DECODED_SCHEMA)


AUDIO_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

_WAV_RATE = 8000


def synth_wav_bytes(media_id: int) -> Optional[bytes]:
    """Deterministic REAL WAV payload (8-bit unsigned mono PCM at
    8 kHz) generated from the id alone: sample i is ``(i*k) % 256``
    with ``k = media_id % 251 + 1`` and ``(media_id % 30 + 1) * 400``
    samples — a closed form the DuckDB oracle reproduces without any
    WAV parsing.  Ids divisible by 97 yield a truncated/corrupt blob
    to exercise per-row decoder degradation on the certified path."""
    if media_id % 97 == 0:
        return b"RIFFcorrupt-not-a-wav"
    import io
    import wave

    k = media_id % 251 + 1
    n = (media_id % 30 + 1) * 400
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(_WAV_RATE)
        w.writeframes(
            (np.arange(n, dtype=np.int64) * k % 256).astype(np.uint8).tobytes()
        )
    return buf.getvalue()


def synth_audio(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Audio media table with real WAV binary content, Arrow-batched.
    (The container ships no media fixtures; the WAV bytes are real —
    stdlib-encoded — just deterministically synthesized.)"""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": [synth_wav_bytes(int(i)) for i in pdf[id_col]],
                    "media_type": "audio",
                    "format": "wav",
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("media_type", StringType(), True),
            StructField("format", StringType(), True),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(kernel, schema)


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio decode + feature-extract via mapInPandas (same
    narrow-map, binary-dropped-after-decode shape as decode_media);
    kernel = stdlib ``wav_decode``, per-row corrupt degradation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [wav_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "n_channels": [d["n_channels"] for d in decoded],
                    "n_samples": [d["n_samples"] for d in decoded],
                    "duration_ms": [d["duration_ms"] for d in decoded],
                    "rms": [d["rms"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.mapInPandas(kernel, AUDIO_DECODED_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` (the
    container ships no binary fixtures): content = utf-8 bytes of the
    text, media_type cycles image/audio/video on doc_id, duration
    only for audio/video.  Mirrored by MEDIA_CTE_SQL for the oracle."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        mt.alias("media_type"),
        F.when(mt == "image", F.lit("png")).otherwise(F.lit("mp4")).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(mt != "image", (F.col("doc_id") % 30 + 1) * 1000)
        .cast("bigint")
        .alias("duration_ms"),
    )


# Must mirror media_from_documents() exactly (oracle CTE).
MEDIA_CTE_SQL = """
media AS (
  SELECT doc_id AS media_id,
         text AS content_text,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'mp4' END AS format,
         CAST(NULL AS INT) AS width,
         CAST(NULL AS INT) AS height,
         CASE WHEN doc_id % 3 <> 0
              THEN CAST((doc_id % 30 + 1) * 1000 AS BIGINT) END AS duration_ms
  FROM documents
)
"""


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: emits one row per sampled frame
    offset (the decode itself is the pluggable kernel).  Pure column
    arithmetic — the expensive part stays a narrow map."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            # explode_outer: explode would infer a size>0 scan filter
            # re-evaluating the sequence (never empty here anyway —
            # greatest(...,0) bounds it) — see dedup.contamination_report
            F.explode_outer(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("offset_ms", F.col("frame_idx") * every_ms)
    )


# ---- Perceptual hashing (average hash) -------------------------------------

def bmp_ahash16(content: Optional[bytes]) -> Optional[int]:
    """16-bit average hash (aHash) from a REAL BMP decode — the
    image near-duplicate primitive: re-encodes, slight brightness
    shifts, and metadata changes keep the hash stable while distinct
    images differ in many bits.

    Pipeline (4x4 grid — the classic 8x8 needs >=8px sides, and the
    synthetic corpus goes down to 4x4): integer grayscale
    (r+g+b)//3, block index (x*4)//w x (y*4)//h, per-block mean
    (sum//count), global mean of the 16 block means (sum//16), bit b
    set when block b's mean is STRICTLY above the global mean.
    Every step is integer floor arithmetic, so a DuckDB oracle
    reproduces the hash from the synthesis closed form without
    parsing BMP (the media_image_decode pattern).  Undecodable
    payloads return None.
    """
    import struct

    if content is None or len(content) < 54 or content[:2] != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", content, 10)
    hdrsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if hdrsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, habs = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(content) < offset + stride * habs:
        return None
    px = (
        np.frombuffer(content, dtype=np.uint8, count=stride * habs, offset=offset)
        .reshape(habs, stride)[:, : w * 3]
        .reshape(habs, w, 3)
    )
    if not top_down:
        px = px[::-1]
    gray = px.astype(np.int64).sum(axis=2) // 3  # (h, w); channel order moot
    bx = (np.arange(w, dtype=np.int64) * 4) // w
    by = (np.arange(habs, dtype=np.int64) * 4) // habs
    idx = (by[:, None] * 4 + bx[None, :]).ravel()
    sums = np.zeros(16, dtype=np.int64)
    counts = np.zeros(16, dtype=np.int64)
    np.add.at(sums, idx, gray.ravel())
    np.add.at(counts, idx, 1)
    avg = sums // counts  # w, h >= 4 => every block nonempty
    mean = avg.sum() // 16
    bits = (avg > mean).astype(np.int64)
    return int((bits << np.arange(16, dtype=np.int64)).sum())


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", LongType(), True),
    ]
)


def ahash_images(media: DataFrame) -> DataFrame:
    """(media_id, ahash) via Arrow-batched mapInPandas; binary
    dropped after hashing (narrow map), corrupt rows degrade to
    NULL per row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pd.array(
                        [bmp_ahash16(c) for c in pdf["content"]], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(kernel, AHASH_SCHEMA)


# ---- voice-activity / energy profile over decoded audio ----------------------
# The audio-curation step after decode: frame the clip into fixed
# windows, measure per-frame energy, and report how much of the clip
# is low-energy (the silence-trim / dead-air screen a speech-data
# pipeline runs before transcription).  Per-frame energy is the EXACT
# integer sum of squared centered samples — comparisons and counts
# are integer ops, and the two emitted RMS figures are one float
# divide+sqrt on exact integers — so the certified row checks real
# framing arithmetic bit-for-bit (the wav_decode discipline).
VAD_FRAME_LEN = 400  # 50 ms at the 8 kHz synth rate
VAD_LOW_MEAN_SQ = 5400  # mean-square threshold ~ the 8-bit PCM average

AUDIO_VAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("low_frames", LongType(), True),
        StructField("low_ratio_ppm", LongType(), True),
        # ppm-floored integers, not round(x, 6) doubles: Python's
        # round is banker's, DuckDB's is half-away — floor(x * 1e6)
        # via math.sqrt is the same two IEEE ops on both engines
        StructField("peak_rms_ppm", LongType(), True),
        StructField("min_rms_ppm", LongType(), True),
    ]
)


def _wav_frame_profile(content, frame_len: int, low_mean_sq: int) -> dict:
    """Per-clip frame-energy profile from one WAV blob (full frames
    only; a trailing partial frame is dropped).  NULL row on corrupt
    input, like wav_decode."""
    import io
    import wave

    null = {
        "n_frames": None, "low_frames": None, "low_ratio_ppm": None,
        "peak_rms_ppm": None, "min_rms_ppm": None,
    }
    if content is None:
        return null
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            width = w.getsampwidth()
            n = w.getnframes()
            raw = w.readframes(n)
    except Exception:
        return null
    if width != 1:
        return null
    samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    nf = len(samples) // frame_len
    if nf == 0:
        return {
            "n_frames": 0, "low_frames": 0, "low_ratio_ppm": 0,
            "peak_rms_ppm": None, "min_rms_ppm": None,
        }
    framed = samples[: nf * frame_len].reshape(nf, frame_len)
    ssq = (framed * framed).sum(axis=1)  # exact int64 per frame
    thr = low_mean_sq * frame_len
    low = int((ssq < thr).sum())
    import math

    denom = frame_len * 16384.0
    return {
        "n_frames": nf,
        "low_frames": low,
        "low_ratio_ppm": low * 1_000_000 // nf,
        "peak_rms_ppm": int(math.sqrt(int(ssq.max()) / denom) * 1000000.0),
        "min_rms_ppm": int(math.sqrt(int(ssq.min()) / denom) * 1000000.0),
    }


def vad_profile(
    media: DataFrame,
    frame_len: int = VAD_FRAME_LEN,
    low_mean_sq: int = VAD_LOW_MEAN_SQ,
) -> DataFrame:
    """Frame-energy VAD profile via mapInPandas (narrow map, binary
    dropped after the kernel — the decode_audio shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prof = [
                _wav_frame_profile(c, frame_len, low_mean_sq)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": [p["n_frames"] for p in prof],
                    "low_frames": [p["low_frames"] for p in prof],
                    "low_ratio_ppm": [p["low_ratio_ppm"] for p in prof],
                    "peak_rms_ppm": [p["peak_rms_ppm"] for p in prof],
                    "min_rms_ppm": [p["min_rms_ppm"] for p in prof],
                }
            )

    return media.mapInPandas(kernel, AUDIO_VAD_SCHEMA)


# ---- per-channel pixel histogram over decoded images --------------------------
# The image-statistics step after decode (exposure/color screening
# before a vision model sees the corpus): bucket every pixel value
# into 256/n_buckets-wide bands per channel and count.  Counts are
# exact integers from the REAL parsed pixel array, so the certified
# row checks stride/row-order/channel-order handling pixel-by-pixel
# (a histogram is wrong if ANY pixel lands in the wrong band —
# stronger than the channel sums media_image_decode certifies).
IMG_HIST_BUCKETS = 4

IMAGE_HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("channel", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("n_pixels", LongType(), False),
    ]
)


def _bmp_pixel_array(content) -> Optional[np.ndarray]:
    """Parse a 24-bit BMP to its logical top-down (h, w, 3) B,G,R
    pixel array, or None when undecodable (the bmp_decode rules)."""
    import struct

    if content is None or len(content) < 54 or content[:2] != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", content, 10)
    hdrsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if hdrsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, habs = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(content) < offset + stride * habs:
        return None
    px = (
        np.frombuffer(content, dtype=np.uint8, count=stride * habs, offset=offset)
        .reshape(habs, stride)[:, : w * 3]
        .reshape(habs, w, 3)
    )
    return px if top_down else px[::-1]


def image_histogram(media: DataFrame, n_buckets: int = IMG_HIST_BUCKETS) -> DataFrame:
    """Long-format per-channel histogram via mapInPandas (narrow map,
    binary dropped after the kernel).  Undecodable blobs contribute
    no rows — the join-side NULL semantics live in the query."""
    width = 256 // n_buckets

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "channel": [], "bucket": [], "n_pixels": []
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _bmp_pixel_array(content)
                if px is None:
                    continue
                flat = px.reshape(-1, 3)
                for ci, name in ((2, "r"), (1, "g"), (0, "b")):
                    counts = np.bincount(
                        flat[:, ci] // width, minlength=n_buckets
                    )
                    for b in range(n_buckets):
                        out["media_id"].append(int(mid))
                        out["channel"].append(name)
                        out["bucket"].append(b)
                        out["n_pixels"].append(int(counts[b]))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, IMAGE_HIST_SCHEMA)


CLIP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("n_clipped", LongType(), True),
    ]
)


def wav_clip_stats(content: Optional[bytes]) -> tuple:
    """Clipping screen for 8-bit unsigned PCM: how many samples sit at
    full-scale 255?  Parsed with the same stdlib ``wave`` path as
    :func:`wav_decode`; undecodable payloads degrade to NULLs."""
    import io
    import wave

    if content is None:
        return (None, None)
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 1 or w.getnchannels() != 1:
                return (None, None)
            raw = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.uint8
            )
    except Exception:
        return (None, None)
    return (int(raw.size), int((raw == 255).sum()))


def audio_clip_screen(media: DataFrame) -> DataFrame:
    """Per-payload clipping stats via the decode_audio mapInPandas
    shape (narrow map, binary dropped after the kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [wav_clip_stats(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": [s[0] for s in stats],
                    "n_clipped": [s[1] for s in stats],
                }
            )

    return media.mapInPandas(kernel, CLIP_STATS_SCHEMA)


BORDER_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_border", LongType(), True),
        StructField("n_interior", LongType(), True),
        StructField("border_sum_r", LongType(), True),
        StructField("interior_sum_r", LongType(), True),
    ]
)


def bmp_border_stats(content: Optional[bytes]) -> tuple:
    """Border-vs-interior red-channel sums through the REAL BMP parse
    (letterbox / solid-border screen ingredient).  Border = row 0,
    last row, col 0, last col of the logical top-down image.
    Undecodable payloads degrade to NULLs."""
    import struct

    null = (None, None, None, None)
    if content is None or len(content) < 54 or content[:2] != b"BM":
        return null
    (offset,) = struct.unpack_from("<I", content, 10)
    hdrsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if hdrsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return null
    top_down, habs = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(content) < offset + stride * habs:
        return null
    px = (
        np.frombuffer(content, dtype=np.uint8, count=stride * habs, offset=offset)
        .reshape(habs, stride)[:, : w * 3]
        .reshape(habs, w, 3)
    )
    if not top_down:
        px = px[::-1]
    r = px[:, :, 2].astype(np.int64)
    border = np.zeros((habs, w), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    return (
        int(border.sum()),
        int((~border).sum()),
        int(r[border].sum()),
        int(r[~border].sum()),
    )


def image_border_screen(media: DataFrame) -> DataFrame:
    """Per-payload border stats via the decode_images mapInPandas
    shape (narrow map, binary dropped after the kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [bmp_border_stats(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_border": [s[0] for s in stats],
                    "n_interior": [s[1] for s in stats],
                    "border_sum_r": [s[2] for s in stats],
                    "interior_sum_r": [s[3] for s in stats],
                }
            )

    return media.mapInPandas(kernel, BORDER_STATS_SCHEMA)


LOUDNESS_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("dev_sq_sum", LongType(), True),
        StructField("peak_dev", LongType(), True),
    ]
)


def wav_loudness_stats(content: Optional[bytes]) -> tuple:
    """Loudness sufficient statistics for 8-bit unsigned PCM: the
    exact integer sum of squared deviations from the 128 midpoint and
    the peak absolute deviation.  RMS/crest are derived DOWNSTREAM in
    one column expression each (single correctly-rounded sqrt), so
    the kernel ships three integers per track, never the samples.
    Parsed with the same stdlib ``wave`` path as :func:`wav_decode`;
    undecodable payloads degrade to NULLs."""
    import io
    import wave

    if content is None:
        return (None, None, None)
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 1 or w.getnchannels() != 1:
                return (None, None, None)
            raw = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.uint8
            )
    except Exception:
        return (None, None, None)
    if raw.size == 0:
        # A valid zero-frame WAV must degrade to full NULLs: a
        # (0, 0, None) row would pass downstream isNotNull() filters
        # and feed sqrt(0/0)=NaN, where Spark's non-ANSI NaN->BIGINT
        # cast and DuckDB diverge (r6 advice).
        return (None, None, None)
    dev = raw.astype(np.int64) - 128
    return (
        int(raw.size),
        int((dev * dev).sum()),
        int(np.abs(dev).max()),
    )


def audio_loudness_screen(media: DataFrame) -> DataFrame:
    """Per-payload loudness stats via the decode_audio mapInPandas
    shape (narrow map, binary dropped after the kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [wav_loudness_stats(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": [s[0] for s in stats],
                    "dev_sq_sum": [s[1] for s in stats],
                    "peak_dev": [s[2] for s in stats],
                }
            )

    return media.mapInPandas(kernel, LOUDNESS_STATS_SCHEMA)
