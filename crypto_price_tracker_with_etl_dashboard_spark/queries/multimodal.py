"""Multimodal-column operators, oracle-checked end to end.

The binary payloads are deterministic (utf-8 bytes of document text,
see sources/multimodal.py), so even the Arrow-batched mapInPandas
decode kernel has an exact DuckDB twin: fake_decode derives
dimensions/features from md5(content), which the oracle reproduces
with hex-substring arithmetic on md5(text).  What this certifies is
the REAL plumbing — binary column handling, mapInPandas schema and
batching, float32 feature arrays — not the stub codec itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
    MEDIA_CTE_SQL,
    decode_audio,
    decode_images,
    decode_media,
    fake_decode,
    frame_sample_plan,
    media_from_documents,
    synth_audio,
    synth_images,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the binary column, reduced to
    engine-portable integers: the float32 features are mapped back to
    their source bytes (round(f*255) is exact — the float32
    representation error of b/255 is ~1e-7) and summed."""
    media = media_from_documents(fan_out(load_table(spark, sf_dir, "documents")))
    decoded = decode_media(media, decode_fn=fake_decode)
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.size("features").alias("n_features"),
        F.aggregate(
            "features",
            F.lit(0).cast("bigint"),
            lambda acc, f: acc + F.round(f * 255).cast("bigint"),
        ).alias("feat_byte_sum"),
    )


register(
    "media_decode",
    q_media_decode,
    f"""
    WITH {MEDIA_CTE_SQL}
    SELECT media_id,
           1 + ('0x' || substr(md5(content_text), 1, 2))::INT  AS width,
           1 + ('0x' || substr(md5(content_text), 3, 2))::INT  AS height,
           CAST(strlen(content_text) AS BIGINT)                AS n_bytes,
           16                                                  AS n_features,
           CAST(list_sum(list_transform(range(0, 16),
                i -> ('0x' || substr(md5(content_text), 1 + 2*i, 2))::BIGINT))
                AS BIGINT)                                     AS feat_byte_sum
    FROM media
    """,
)


def q_media_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end: synthesize deterministic WAV
    blobs (8-bit mono PCM, stdlib ``wave``-encoded), decode them back
    with the stdlib ``wav_decode`` kernel, and emit sample-rate /
    duration / exact-integer RMS.  Because the sample formula is
    closed-form, the oracle reproduces every value WITHOUT parsing
    WAV — what the driver certifies is the real encode->decode
    round-trip through Arrow-batched mapInPandas, including per-row
    corrupt-blob degradation (ids % 97 == 0 are undecodable and must
    come back as NULLs, not fail the task)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_audio(docs.select(F.col("doc_id").alias("media_id")))
    return decode_audio(media).select(
        "media_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
    )


register(
    "media_audio_decode",
    q_media_audio_decode,
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1                       AS k,
             (doc_id % 30 + 1) * 400                AS n,
             doc_id % 97 = 0                        AS corrupt
      FROM documents
    )
    SELECT media_id,
           CASE WHEN NOT corrupt THEN 8000 END      AS sample_rate,
           CASE WHEN NOT corrupt THEN 1 END         AS n_channels,
           CASE WHEN NOT corrupt THEN CAST(n AS BIGINT) END AS n_samples,
           CASE WHEN NOT corrupt THEN CAST(n * 1000 / 8000 AS BIGINT) END
                                                    AS duration_ms,
           CASE WHEN NOT corrupt THEN
             round(sqrt(CAST(list_sum(list_transform(range(0, n),
                     i -> CAST(((i * k) % 256 - 128) AS BIGINT)
                          * (((i * k) % 256) - 128))) AS DOUBLE)
                        / (n * 16384.0)), 6)
           END                                      AS rms
    FROM params
    """,
)


def q_media_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end to end: synthesize deterministic 24-bit
    BMP blobs (bottom-up rows, 4-byte stride), parse them back with
    the stdlib ``bmp_decode`` kernel, and emit dimensions plus
    exact-integer per-channel pixel sums.  The pixel formula is
    closed-form, so the oracle reproduces every value WITHOUT parsing
    BMP — what the driver certifies is real pixel extraction through
    Arrow-batched mapInPandas (including stride/row-order handling:
    get either wrong and every channel sum is wrong), with per-row
    corrupt-blob degradation (ids % 97 == 0 must come back NULL, not
    fail the task)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_images(docs.select(F.col("doc_id").alias("media_id")))
    return decode_images(media)


register(
    "media_image_decode",
    q_media_image_decode,
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1            AS k,
             doc_id % 13 + 4             AS w,
             doc_id % 7 + 4              AS h,
             doc_id % 97 = 0             AS corrupt
      FROM documents
    )
    SELECT media_id,
           CASE WHEN NOT corrupt THEN CAST(w AS INT) END      AS width,
           CASE WHEN NOT corrupt THEN CAST(h AS INT) END      AS height,
           CASE WHEN NOT corrupt THEN CAST(w * h AS BIGINT) END AS n_pixels,
           CASE WHEN NOT corrupt THEN CAST(list_sum(list_transform(
             range(0, w * h),
             i -> (2 * (i % w) + 3 * (i // w) + 3 * k) % 256)) AS BIGINT)
           END                                                AS sum_r,
           CASE WHEN NOT corrupt THEN CAST(list_sum(list_transform(
             range(0, w * h),
             i -> (3 * (i % w) + (i // w) + 2 * k) % 256)) AS BIGINT)
           END                                                AS sum_g,
           CASE WHEN NOT corrupt THEN CAST(list_sum(list_transform(
             range(0, w * h),
             i -> ((i % w) + 2 * (i // w) + k) % 256)) AS BIGINT)
           END                                                AS sum_b
    FROM params
    """,
)


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(media, every_ms=1000)


register(
    "media_frame_sample",
    q_media_frame_sample,
    f"""
    WITH {MEDIA_CTE_SQL}
    SELECT media_id,
           CAST(unnest(range(0, greatest(CAST(duration_ms / 1000 AS BIGINT), 1)))
                AS INT)                         AS frame_idx,
           CAST(unnest(range(0, greatest(CAST(duration_ms / 1000 AS BIGINT), 1)))
                * 1000 AS INT)                  AS offset_ms
    FROM media WHERE media_type = 'video'
    """,
)


def q_media_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average) hash per image, computed by REALLY
    decoding the BMP blobs — the image near-duplicate primitive.
    Every integer step (grayscale, 4x4 block means, global mean,
    strict-above bits) is floor arithmetic, so the oracle reproduces
    each 16-bit hash from the synthesis closed form without BMP
    parsing; corrupt blobs (ids % 97 == 0) degrade to NULL per row."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        ahash_images,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_images(docs.select(F.col("doc_id").alias("media_id")))
    return ahash_images(media)


register(
    "media_image_ahash",
    q_media_image_ahash,
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1            AS k,
             doc_id % 13 + 4             AS w,
             doc_id % 7 + 4              AS h,
             doc_id % 97 = 0             AS corrupt
      FROM documents
    ),
    pix AS (
      SELECT media_id,
             ((u % w) * 4) // w AS bx,
             ((u // w) * 4) // h AS by,
             (  ((2 * (u % w) + 3 * (u // w) + 3 * k) % 256)
              + ((3 * (u % w) + (u // w) + 2 * k) % 256)
              + (((u % w) + 2 * (u // w) + k) % 256)) // 3 AS gray
      FROM (SELECT media_id, k, w, h, unnest(range(0, w * h)) AS u
            FROM params WHERE NOT corrupt)
    ),
    blocks AS (
      SELECT media_id, by * 4 + bx AS b, SUM(gray) // COUNT(*) AS avg
      FROM pix GROUP BY media_id, by * 4 + bx
    ),
    means AS (SELECT media_id, SUM(avg) // 16 AS mean FROM blocks GROUP BY media_id),
    hashes AS (
      SELECT b.media_id,
             CAST(SUM(CASE WHEN b.avg > m.mean THEN 1 << b.b ELSE 0 END)
                  AS BIGINT) AS ahash
      FROM blocks b JOIN means m USING (media_id)
      GROUP BY b.media_id
    )
    SELECT p.media_id, h.ahash
    FROM params p LEFT JOIN hashes h USING (media_id)
    """,
)


def q_media_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy VAD profile over REAL decoded WAV: 50 ms frames,
    exact-integer per-frame energy, low-energy frame counts and
    ppm-floored peak/min frame RMS (sources/multimodal.py::
    vad_profile) — the silence-trim screen a speech pipeline runs
    after decode.  The synth samples are closed-form, so the oracle
    reproduces every frame sum WITHOUT WAV parsing; what the
    certified row checks is the real frame/reshape/threshold
    arithmetic through Arrow-batched mapInPandas, including corrupt
    rows degrading to NULLs."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        synth_audio,
        vad_profile,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_audio(docs.select(F.col("doc_id").alias("media_id")))
    return vad_profile(media)


register(
    "media_audio_vad",
    q_media_audio_vad,
    # mirrors sources/multimodal.py::synth_wav_bytes (sample i =
    # (i*k) % 256 - 128 centered, k = id % 251 + 1, n = (id%30+1)*400)
    # and _wav_frame_profile (frame = 400 samples, low threshold
    # mean-square 5400, ppm floors)
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1                       AS k,
             (doc_id % 30 + 1) * 400                AS n,
             doc_id % 97 = 0                        AS corrupt
      FROM documents
    ),
    frames AS (
      SELECT media_id, k,
             CAST(unnest(range(0, n // 400)) AS BIGINT) AS f
      FROM params WHERE NOT corrupt
    ),
    energy AS (
      SELECT media_id,
             CAST(list_sum(list_transform(range(f * 400, (f + 1) * 400),
                    i -> CAST(((i * k) % 256 - 128) AS BIGINT)
                         * (((i * k) % 256) - 128))) AS BIGINT) AS ssq
      FROM frames
    ),
    prof AS (
      SELECT media_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN ssq < 5400 * 400 THEN 1 ELSE 0 END)
                  AS BIGINT) AS low_frames,
             CAST(MAX(ssq) AS BIGINT) AS max_ssq,
             CAST(MIN(ssq) AS BIGINT) AS min_ssq
      FROM energy GROUP BY media_id
    )
    SELECT p.media_id,
           pr.n_frames,
           pr.low_frames,
           pr.low_frames * 1000000 // pr.n_frames AS low_ratio_ppm,
           CAST(floor(sqrt(CAST(pr.max_ssq AS DOUBLE) / (400 * 16384.0))
                      * 1000000.0) AS BIGINT) AS peak_rms_ppm,
           CAST(floor(sqrt(CAST(pr.min_ssq AS DOUBLE) / (400 * 16384.0))
                      * 1000000.0) AS BIGINT) AS min_rms_ppm
    FROM params p LEFT JOIN prof pr USING (media_id)
    """,
)


def q_media_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel 4-band pixel histogram over REAL decoded BMPs
    (sources/multimodal.py::image_histogram): exposure/color
    screening, and a stronger decode certificate than channel sums —
    every pixel must land in the right band or a count is wrong.
    Corrupt blobs contribute no rows (ids % 97 == 0)."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        image_histogram,
        synth_images,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_images(docs.select(F.col("doc_id").alias("media_id")))
    return image_histogram(media).orderBy("media_id", "channel", "bucket")


register(
    "media_image_histogram",
    q_media_image_histogram,
    # mirrors synth_bmp_bytes' closed pixel form; 64-wide bands
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1            AS k,
             doc_id % 13 + 4             AS w,
             doc_id % 7 + 4              AS h
      FROM documents WHERE doc_id % 97 <> 0
    ),
    px AS (
      SELECT media_id, k, w,
             unnest(range(0, w * h)) AS i
      FROM params
    ),
    vals AS (
      SELECT media_id, 'r' AS channel,
             ((2 * (i % w) + 3 * (i // w) + 3 * k) % 256) // 64 AS bucket
      FROM px
      UNION ALL
      SELECT media_id, 'g',
             ((3 * (i % w) + (i // w) + 2 * k) % 256) // 64
      FROM px
      UNION ALL
      SELECT media_id, 'b',
             (((i % w) + 2 * (i // w) + k) % 256) // 64
      FROM px
    ),
    counted AS (
      SELECT media_id, channel, bucket, CAST(COUNT(*) AS BIGINT) AS n_pixels
      FROM vals GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT p.media_id, c.channel, b.bucket
      FROM params p
      CROSS JOIN (SELECT unnest(['r','g','b']) AS channel) c
      CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS bucket) b
    )
    SELECT g.media_id, g.channel, g.bucket,
           COALESCE(c.n_pixels, 0) AS n_pixels
    FROM grid g LEFT JOIN counted c
      ON g.media_id = c.media_id AND g.channel = c.channel
     AND g.bucket = c.bucket
    ORDER BY g.media_id, g.channel, g.bucket
    """,
)


# ---- binary checksum dedup ----------------------------------------------------
# The first pass every image/audio corpus gets before any expensive
# perceptual hashing: exact duplicate detection on the raw BYTES via
# md5 over the binary column.  Spark's md5 runs on the binary payload
# itself; the oracle reproduces it from the source text (identical
# utf-8 bytes, sources/multimodal.py contract) — what's certified is
# the binary-column fingerprint plumbing.  One shuffle on the 128-bit
# digest with map-side partials; the summary fold is a 1-row agg.
# Per-type breakdown keeps the row count at |media_type| = 3.


def q_media_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(fan_out(load_table(spark, sf_dir, "documents")))
    groups = media.groupBy(
        "media_type", F.md5("content").alias("digest")
    ).agg(F.count("*").cast("bigint").alias("copies"))
    return (
        groups.groupBy("media_type")
        .agg(
            F.sum("copies").cast("bigint").alias("n_media"),
            F.count("*").cast("bigint").alias("n_unique"),
            F.max("copies").alias("max_copies"),
        )
        .select(
            "media_type",
            "n_media",
            "n_unique",
            F.expr("n_media - n_unique").alias("n_duplicates"),
            F.expr("(n_media - n_unique) * 1000000 div n_media").alias("dup_ppm"),
            "max_copies",
        )
        .orderBy("media_type")
    )


register(
    "media_binary_dedup",
    q_media_binary_dedup,
    f"""
    WITH {MEDIA_CTE_SQL.strip()},
    groups AS (
      SELECT media_type, md5(content_text) AS digest,
             CAST(COUNT(*) AS BIGINT) AS copies
      FROM media GROUP BY 1, 2
    )
    SELECT media_type,
           CAST(SUM(copies) AS BIGINT) AS n_media,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(copies) AS BIGINT) - CAST(COUNT(*) AS BIGINT)
             AS n_duplicates,
           (CAST(SUM(copies) AS BIGINT) - CAST(COUNT(*) AS BIGINT)) * 1000000
             // CAST(SUM(copies) AS BIGINT) AS dup_ppm,
           MAX(copies) AS max_copies
    FROM groups GROUP BY 1 ORDER BY 1
    """,
)


# ---- video scene-cut detection ------------------------------------------------
# The frame-pipeline read on top of media_frame_sample: per sampled
# frame a deterministic intensity (first md5 byte of payload+frame
# index — the stub-codec discipline of media_decode: the Spark-side
# shape being certified is the REAL one, a per-video lag window over
# an exploded frame plan), a cut wherever the intensity jumps by more
# than the threshold, and a per-video summary.  At scale the frame
# table is |videos| x fps rows, partitioned by media_id; the lag
# window never crosses videos.

_CUT_THRESHOLD = 64  # |delta intensity| on the 0-255 scale


def q_media_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    media = media_from_documents(fan_out(load_table(spark, sf_dir, "documents")))
    frames = frame_sample_plan(media.filter(F.col("media_type") == "video"),
                               every_ms=1000)
    feat = frames.join(
        media.select("media_id", F.col("content").cast("string").alias("__txt")),
        "media_id",
    ).select(
        "media_id",
        "frame_idx",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("__txt"), F.col("frame_idx"))), 1, 2
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("intensity"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    deltas = (
        feat.withColumn("__prev", F.lag("intensity").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            "media_id",
            F.abs(F.col("intensity") - F.col("__prev")).alias("d"),
        )
    )
    return (
        deltas.groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.sum((F.col("d") > _CUT_THRESHOLD).cast("bigint")).alias("n_cuts"),
            F.max("d").alias("max_delta"),
        )
        .select(
            "media_id",
            "n_transitions",
            "n_cuts",
            F.expr("n_cuts * 1000000 div n_transitions").alias("cut_ppm"),
            "max_delta",
        )
        .orderBy("media_id")
    )


register(
    "media_scene_cuts",
    q_media_scene_cuts,
    f"""
    WITH {MEDIA_CTE_SQL.strip()},
    frames AS (
      SELECT media_id, content_text,
             CAST(unnest(range(0, greatest(CAST(duration_ms / 1000 AS BIGINT),
                                           1))) AS INT) AS frame_idx
      FROM media WHERE media_type = 'video'
    ),
    feat AS (
      SELECT media_id, frame_idx,
             ('0x' || substr(md5(content_text || '#' || frame_idx), 1, 2))::BIGINT
               AS intensity
      FROM frames
    ),
    deltas AS (
      SELECT media_id, abs(intensity - prev) AS d
      FROM (
        SELECT media_id, intensity,
               lag(intensity) OVER (PARTITION BY media_id ORDER BY frame_idx)
                 AS prev
        FROM feat
      ) WHERE prev IS NOT NULL
    )
    SELECT media_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN d > {_CUT_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cuts,
           CAST(SUM(CASE WHEN d > {_CUT_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // COUNT(*) AS cut_ppm,
           MAX(d) AS max_delta
    FROM deltas GROUP BY 1 ORDER BY 1
    """,
)


# ---- audio clipping screen ----------------------------------------------------
# The audio-quality gate next to the VAD profile: what share of each
# payload's samples sit at full scale (255 on the 8-bit grid)?
# Clipped recordings distort every downstream feature, so corpora
# screen them out before feature extraction.  The Spark side is the
# REAL decode path (stdlib wave parse + numpy full-scale count inside
# the decode_audio mapInPandas shape); the oracle counts the
# closed-form solutions of (i*k) % 256 = 255 without parsing WAV —
# same certification contract as media_audio_decode.  Corrupt blobs
# degrade to NULL and are filtered identically.


def q_media_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        audio_clip_screen,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_audio(docs.select(F.col("doc_id").alias("media_id")))
    return (
        audio_clip_screen(media)
        .filter(F.col("n_samples").isNotNull())
        .select(
            "media_id",
            "n_samples",
            "n_clipped",
            F.expr("n_clipped * 1000000 div n_samples").alias("clip_ppm"),
        )
        .orderBy("media_id")
    )


register(
    "media_audio_clipping",
    q_media_audio_clipping,
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1        AS k,
             (doc_id % 30 + 1) * 400 AS n
      FROM documents WHERE doc_id % 97 <> 0
    )
    SELECT media_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(len(list_filter(range(0, n), i -> (i * k) % 256 = 255))
                AS BIGINT) AS n_clipped,
           CAST(len(list_filter(range(0, n), i -> (i * k) % 256 = 255))
                AS BIGINT) * 1000000 // n AS clip_ppm
    FROM params ORDER BY media_id
    """,
)


# ---- image border-vs-interior screen ------------------------------------------
# The letterbox / solid-border ingredient: per image, red-channel
# mean over the 1-pixel border frame vs the interior, through the
# REAL BMP parse (same mapInPandas contract as media_image_decode —
# stride and bottom-up row order must both be right or the border
# mask lands on the wrong pixels).  The oracle reproduces the sums
# from the synthesis formula with a border predicate on (x, y) —
# no BMP parsing.  Means are milli-floored exact integers.


def q_media_image_border(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        image_border_screen,
        synth_images,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_images(docs.select(F.col("doc_id").alias("media_id")))
    return (
        image_border_screen(media)
        .filter(F.col("n_border").isNotNull())
        .select(
            "media_id",
            "n_border",
            "n_interior",
            F.expr("border_sum_r * 1000 div n_border").alias("border_mean_milli"),
            F.expr("interior_sum_r * 1000 div n_interior").alias(
                "interior_mean_milli"
            ),
            F.expr(
                "border_sum_r * 1000 div n_border"
                " - interior_sum_r * 1000 div n_interior"
            ).alias("contrast_milli"),
        )
        .orderBy("media_id")
    )


register(
    "media_image_border",
    q_media_image_border,
    """
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1 AS k,
             doc_id % 13 + 4  AS w,
             doc_id % 7 + 4   AS h
      FROM documents WHERE doc_id % 97 <> 0
    ),
    sums AS (
      SELECT media_id,
             CAST(2 * w + 2 * h - 4 AS BIGINT) AS n_border,
             CAST(w * h - (2 * w + 2 * h - 4) AS BIGINT) AS n_interior,
             CAST(list_sum(list_transform(range(0, w * h), i ->
               CASE WHEN (i % w) = 0 OR (i % w) = w - 1
                      OR (i // w) = 0 OR (i // w) = h - 1
                    THEN (2 * (i % w) + 3 * (i // w) + 3 * k) % 256
                    ELSE 0 END)) AS BIGINT) AS border_sum_r,
             CAST(list_sum(list_transform(range(0, w * h), i ->
               CASE WHEN (i % w) = 0 OR (i % w) = w - 1
                      OR (i // w) = 0 OR (i // w) = h - 1
                    THEN 0
                    ELSE (2 * (i % w) + 3 * (i // w) + 3 * k) % 256 END))
               AS BIGINT) AS interior_sum_r
      FROM params
    )
    SELECT media_id, n_border, n_interior,
           border_sum_r * 1000 // n_border AS border_mean_milli,
           interior_sum_r * 1000 // n_interior AS interior_mean_milli,
           border_sum_r * 1000 // n_border
             - interior_sum_r * 1000 // n_interior AS contrast_milli
    FROM sums ORDER BY media_id
    """,
)


# ---- image aspect-ratio profile ---------------------------------------------------
# The curation screen on image geometry: the distribution of aspect
# ratios (milli w/h) through the REAL BMP header parse, with the
# extreme-ratio share (>2:1 either way) that usually marks banners
# and scrollbars rather than content.  Decode plumbing identical to
# media_image_decode; |distinct ratios| output rows.


def q_media_aspect_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        decode_images,
        synth_images,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_images(docs.select(F.col("doc_id").alias("media_id")))
    decoded = decode_images(media).filter(F.col("width").isNotNull())
    ratios = decoded.select(
        F.expr("CAST(width AS BIGINT) * 1000 div CAST(height AS BIGINT)").alias(
            "aspect_milli"
        )
    )
    total = ratios.agg(F.count("*").cast("bigint").alias("n_images"))
    return (
        ratios.groupBy("aspect_milli")
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "aspect_milli",
            "n",
            F.expr("n * 1000000 div n_images").alias("share_ppm"),
            F.expr("aspect_milli > 2000 OR aspect_milli < 500").alias(
                "extreme"
            ),
        )
        .orderBy("aspect_milli")
    )


register(
    "media_aspect_profile",
    q_media_aspect_profile,
    """
    WITH params AS (
      SELECT doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h
      FROM documents WHERE doc_id % 97 <> 0
    ),
    ratios AS (
      SELECT CAST(w AS BIGINT) * 1000 // CAST(h AS BIGINT) AS aspect_milli
      FROM params
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_images FROM ratios)
    SELECT aspect_milli, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) * 1000000 // n_images AS share_ppm,
           aspect_milli > 2000 OR aspect_milli < 500 AS extreme
    FROM ratios CROSS JOIN total
    GROUP BY aspect_milli, n_images ORDER BY aspect_milli
    """,
)


# ---- payload-size outliers -----------------------------------------------------------
# Multimodal intake QA: per media type, the exact median payload size
# (count-bucket order statistic over byte lengths) and how many
# payloads exceed 3x the median — truncated or runaway blobs both
# surface here before any decode cost is paid.  length(content) needs
# no parsing; one (type, size) agg.


def q_media_size_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    media = media_from_documents(fan_out(load_table(spark, sf_dir, "documents")))
    sizes = media.select(
        "media_type", F.length("content").cast("bigint").alias("n_bytes")
    )
    per = sizes.groupBy("media_type", "n_bytes").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("media_type")
        .orderBy("n_bytes")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("media_type"))
    )
    med = cum.filter(F.expr("cum >= (n + 1) div 2")).groupBy("media_type").agg(
        F.min("n_bytes").alias("median_bytes"),
        F.max("n").cast("bigint").alias("n_media"),
    )
    return (
        sizes.join(F.broadcast(med), "media_type")
        .groupBy("media_type", "median_bytes", "n_media")
        .agg(
            F.sum(F.expr("CAST(n_bytes > 3 * median_bytes AS BIGINT)"))
            .cast("bigint")
            .alias("oversized")
        )
        .select(
            "media_type",
            "n_media",
            "median_bytes",
            "oversized",
            F.expr("oversized * 1000000 div n_media").alias("oversized_ppm"),
        )
        .orderBy("media_type")
    )


register(
    "media_size_outliers",
    q_media_size_outliers,
    f"""
    WITH {MEDIA_CTE_SQL.strip()},
    sizes AS (
      SELECT media_type, CAST(strlen(content_text) AS BIGINT) AS n_bytes
      FROM media
    ),
    per AS (
      SELECT media_type, n_bytes, CAST(COUNT(*) AS BIGINT) AS c
      FROM sizes GROUP BY 1, 2
    ),
    cum AS (
      SELECT media_type, n_bytes, c,
             CAST(SUM(c) OVER (PARTITION BY media_type ORDER BY n_bytes
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(c) OVER (PARTITION BY media_type) AS BIGINT) AS n
      FROM per
    ),
    med AS (
      SELECT media_type, MIN(n_bytes) AS median_bytes,
             CAST(MAX(n) AS BIGINT) AS n_media
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1
    )
    SELECT s.media_type, n_media, median_bytes,
           CAST(SUM(CASE WHEN s.n_bytes > 3 * median_bytes
                         THEN 1 ELSE 0 END) AS BIGINT) AS oversized,
           CAST(SUM(CASE WHEN s.n_bytes > 3 * median_bytes
                         THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // n_media
             AS oversized_ppm
    FROM sizes s JOIN med ON s.media_type = med.media_type
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)


# ---- audio RMS loudness / crest factor ---------------------------------------
# The level-normalization screen next to the clipping gate: tracks
# whose RMS is far below full scale waste dynamic range (quantization
# noise dominates after normalization), and a high crest factor
# (peak/RMS) flags impulsive content.  The kernel (wav_loudness_stats)
# ships THREE exact integers per track through the REAL stdlib wave
# parse — sum of squared deviations from the 8-bit midpoint, peak
# deviation, count — and RMS/crest are each ONE correctly-rounded
# IEEE sqrt downstream (the prices_roll_spread portability argument).
# The oracle reproduces the integers from the (i*k) % 256 synthesis
# closed form without parsing WAV, then applies the IDENTICAL derived
# expressions.  Corrupt blobs degrade to NULL and are filtered.

_LOUD_RMS = "CAST(floor(sqrt(CAST(dev_sq_sum AS DOUBLE) / n_samples) * 1000) AS BIGINT)"
_LOUD_CREST = (
    "CASE WHEN dev_sq_sum > 0 THEN CAST(floor(CAST(peak_dev AS DOUBLE) * 1000"
    " / sqrt(CAST(dev_sq_sum AS DOUBLE) / n_samples)) AS BIGINT)"
    " ELSE NULL END"
)


def q_media_audio_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.sources.multimodal import (
        audio_loudness_screen,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = synth_audio(docs.select(F.col("doc_id").alias("media_id")))
    return (
        audio_loudness_screen(media)
        .filter(F.col("n_samples").isNotNull())
        .select(
            "media_id",
            "n_samples",
            "peak_dev",
            F.expr(_LOUD_RMS).alias("rms_milli"),
            F.expr(_LOUD_CREST).alias("crest_milli"),
        )
        .orderBy("media_id")
    )


register(
    "media_audio_loudness",
    q_media_audio_loudness,
    f"""
    WITH params AS (
      SELECT doc_id AS media_id,
             doc_id % 251 + 1        AS k,
             (doc_id % 30 + 1) * 400 AS n
      FROM documents WHERE doc_id % 97 <> 0
    ),
    stats AS (
      SELECT media_id,
             CAST(n AS BIGINT) AS n_samples,
             CAST(list_sum(list_transform(range(0, n),
               i -> ((i * k) % 256 - 128) * ((i * k) % 256 - 128)))
               AS BIGINT) AS dev_sq_sum,
             CAST(list_max(list_transform(range(0, n),
               i -> abs((i * k) % 256 - 128))) AS BIGINT) AS peak_dev
      FROM params
    )
    SELECT media_id, n_samples, peak_dev,
           {_LOUD_RMS} AS rms_milli,
           {_LOUD_CREST} AS crest_milli
    FROM stats ORDER BY media_id
    """,
)


# ---- cross-video duplicate-frame detection -------------------------------------
# Batch 57.  Frame-level dedup across videos — the granularity
# between payload checksums (media_binary_dedup: whole files) and
# per-image aHash (media_image_ahash: whole stills): sample frames
# off every video (the certified frame_sample_plan explode), compute
# a compact per-frame perceptual fingerprint, and group the corpus by
# fingerprint to find frames shared by >= 2 DISTINCT videos — intro
# cards, watermarks, freeze frames, re-uploads.  The frame feature is
# the scene-cuts stub-codec discipline (deterministic md5-derived
# value standing in for a real pHash; the certified shape — explode
# -> fingerprint -> one map-side-combinable shuffle on the
# fingerprint key -> bounded output <= 2^bits rows — is the real
# one).  dedupable_frames = n_frames - n_videos is the storage the
# keep-one-per-video policy reclaims.

_FRAME_FP_HEX = 3  # 12-bit fingerprint space


def q_media_frame_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(fan_out(load_table(spark, sf_dir, "documents")))
    frames = frame_sample_plan(
        media.filter(F.col("media_type") == "video"), every_ms=1000
    )
    feat = frames.join(
        media.select("media_id", F.col("content").cast("string").alias("__txt")),
        "media_id",
    ).select(
        "media_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("__txt"), F.col("frame_idx"))),
                1,
                _FRAME_FP_HEX,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("phash"),
    )
    return (
        feat.groupBy("phash")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.count_distinct("media_id").cast("bigint").alias("n_videos"),
        )
        .filter(F.col("n_videos") >= 2)
        .select(
            "phash",
            "n_frames",
            "n_videos",
            F.expr("n_frames - n_videos").alias("dedupable_frames"),
        )
        .orderBy("phash")
    )


register(
    "media_frame_dups",
    q_media_frame_dups,
    f"""
    WITH {MEDIA_CTE_SQL.strip()},
    frames AS (
      SELECT media_id, content_text,
             CAST(unnest(range(0, greatest(CAST(duration_ms / 1000 AS BIGINT),
                                           1))) AS INT) AS frame_idx
      FROM media WHERE media_type = 'video'
    ),
    feat AS (
      SELECT media_id,
             ('0x' || substr(md5(content_text || '#' || frame_idx), 1,
                             {_FRAME_FP_HEX}))::BIGINT AS phash
      FROM frames
    ),
    grp AS (
      SELECT phash,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_videos
      FROM feat GROUP BY phash
    )
    SELECT phash, n_frames, n_videos,
           n_frames - n_videos AS dedupable_frames
    FROM grp WHERE n_videos >= 2 ORDER BY phash
    """,
)
