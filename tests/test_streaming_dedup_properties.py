"""Shuffled-arrival / arbitrary-split property tests for the
streaming document-dedup twin (r8 verdict ask #6; one file per twin — the
model is tests/test_streaming_entry_exit.py): hypothesis draws a
global event sequence, arbitrary micro-batch cut points, and a
per-batch arrival permutation; the stateful kernel folded over those
batches must reproduce the sequential batch-twin reference exactly.
Cross-batch order follows the operator's documented contract
(batches are cuts of the time-ordered stream); the property pinned
is that WITHIN a batch, arrival order and split placement never
matter.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# document-dedup stream (end-to-end: the kernel is Spark's
# dropDuplicatesWithinWatermark; what's ours is the fingerprint and
# the exactly-one-keeper-per-content contract)
# ---------------------------------------------------------------------------

_doc_words = ["alpha", "beta", "GAMMA", "delta  epsilon"]


@settings(max_examples=8, deadline=None)
@given(
    picks=st.lists(
        st.integers(0, len(_doc_words) - 1), min_size=1, max_size=10
    ),
    splits=st.lists(st.integers(0, 10), max_size=2),
    seed=st.randoms(use_true_random=False),
)
def test_doc_dedup_stream_one_keeper_per_content_any_split(
    spark, tmp_path_factory, picks, splits, seed
):
    """Any micro-batch split, any arrival order: the dedup stream
    emits EXACTLY one row per distinct normalized content (no dup,
    no skip), and the emitted fingerprint set equals the batch
    exact_dedup's over the same rows."""
    import pyspark.sql.types as T

    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        exact_dedup,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.streaming import (
        dedup_documents_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, _doc_words[w], t0 + dt.timedelta(seconds=i))
        for i, w in enumerate(picks)
    ]
    cuts = sorted({min(s, len(rows)) for s in splits} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(cuts, cuts[1:])]

    base = tmp_path_factory.mktemp("dedup_prop")
    pdir = str(base / "docs")
    # the file source requires an existing path at stream definition
    spark.createDataFrame([], schema).write.mode("append").parquet(pdir)
    stream = spark.readStream.schema(schema).parquet(pdir)
    q = (
        dedup_documents_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("doc_dedup_prop")
        .start()
    )
    try:
        for b in batches:
            b = list(b)
            seed.shuffle(b)
            if not b:
                continue
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(pdir)
            q.processAllAvailable()
        got = spark.sql("SELECT doc_id, fp FROM doc_dedup_prop").collect()
    finally:
        q.stop()
        spark.catalog.dropTempView("doc_dedup_prop")

    batch_fps = {
        r["fp"]
        for r in exact_dedup(spark.createDataFrame(rows, schema)).collect()
    }
    got_fps = [r["fp"] for r in got]
    assert len(got_fps) == len(set(got_fps))  # no content emitted twice
    assert set(got_fps) == batch_fps  # no content skipped
