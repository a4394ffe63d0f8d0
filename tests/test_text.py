"""Text analysis: token counts, quality features, language ID,
fingerprints."""

from __future__ import annotations

import pytest

from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
    fingerprint,
    lang_guess,
    quality_features,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("one two three",), ("solo",)], ["text"])
    out = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
    assert out == [3, 1]


def test_quality_features(spark):
    df = spark.createDataFrame([("the cat, the hat!",)], ["text"])
    feats = quality_features("text")
    row = df.select(*[c.alias(n) for n, c in feats.items()]).collect()[0]
    assert row["n_chars"] == 17
    assert row["n_tokens"] == 4
    assert row["punct_ratio"] == pytest.approx(2 / 17)
    assert row["distinct_stopwords"] == 1  # 'the' (punctuation sticks to cat,/hat!)


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro y la casa de que y el gato"),
            (3, "der hund und die katze und das haus"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: r["g"] for r in df.select("id", lang_guess("text").alias("g")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["id", "text"],
    )
    out = {r["id"]: r["fp"] for r in df.select("id", fingerprint("text").alias("fp")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert len(out[1]) == 32  # md5 hex


def test_bpe_tokens_segmentation(spark):
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import bpe_tokens

    df = spark.createDataFrame([("It's 42 degrees, isn't it?",)], ["text"])
    out = df.select(bpe_tokens("text").alias("t")).collect()[0]["t"]
    assert out == ["It", "'s", " 42", " degrees", ",", " isn", "'t", " it", "?"]


def test_winnow_fingerprints_shared_for_common_substring(spark):
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        gram_hashes,
        winnow_fingerprints,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "XX the quick brown fox jumps over a sleepy cat"),
        (3, "completely unrelated short string here"),
        (4, "abc"),  # shorter than k -> no grams, no fingerprints
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hashed = df.select("doc_id", gram_hashes("text", 5).alias("hs"))
    fps = hashed.select("doc_id", winnow_fingerprints(F.col("hs"), 4).alias("fps"))
    by_id = {r["doc_id"]: set(r["fps"]) for r in fps.collect()}
    # winnowing guarantees: any shared substring of length >= w+k-1
    # (=8) yields at least one shared fingerprint
    assert by_id[1] & by_id[2]
    assert len(by_id[1] & by_id[3]) < len(by_id[1] & by_id[2])
    assert by_id[4] == set()


def test_scrub_pii_and_counts(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        pii_counts,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk ip 192.168.0.1 tel 555-123-4567"),
            (2, "no pii at all"),
            (3, "two mails x@y.io z@w.ai and 999.999.999.999"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("s"),
            *[c.alias(n) for n, c in pii_counts("text").items()],
        ).collect()
    }
    assert out[1]["s"] == "mail <EMAIL> ip <IP> tel <PHONE>"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert out[2]["s"] == "no pii at all"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    # the naive IPv4 pattern intentionally matches out-of-range octets
    assert (out[3]["n_emails"], out[3]["n_ips"]) == (2, 1)


def test_repetition_features(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        repetition_features,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 1 distinct word of 4; bigram 'a a' x3
            (2, "w x y z"),          # no repetition at all
            (3, "solo"),             # single word: no bigrams -> NULL frac
        ],
        ["doc_id", "text"],
    )
    feats = repetition_features("text")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[c.alias(n) for n, c in feats.items()]).collect()
    }
    assert out[1]["n_words"] == 4 and out[1]["dup_word_frac"] == 0.75
    assert out[1]["n_bigrams"] == 3 and out[1]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_bigrams"] == 0 and out[3]["dup_bigram_frac"] is None


def test_bm25_topk_hand_computed(spark):
    """BM25 on a 3-doc corpus against closed-form scores: only docs
    containing a query term appear, ranked by the Okapi formula with
    doc-length normalization."""
    import math

    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(0, "dup cat"), (1, "cat cat cat"), (2, "dup dup cat")],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, ["dup"], k1=1.2, b=0.75, topk=10).collect()
    # N=3, avgdl=8/3, df(dup)=2 -> idf = ln(1.6)
    idf = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    avgdl = 8 / 3
    s0 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl))
    s2 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    assert [(r["doc_id"], r["rnk"]) for r in out] == [(2, 1), (0, 2)]
    assert out[0]["score"] == round(s2, 6)
    assert out[1]["score"] == round(s0, 6)


def test_bm25_rejects_empty_and_duplicate_terms(spark):
    import pytest

    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import bm25_topk
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_topk(docs, ["hash", "hash"])
