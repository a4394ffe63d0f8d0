"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash —
correctness on planted duplicates/near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
    exact_dedup,
    jaccard,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash32,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm windowsill", "cold doorstep")  # 2-word edit
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution and runtime "
    "code generation for analytical workloads at petabyte scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),        # exact duplicate of 1
        (3, NEAR, "en"),        # near duplicate of 1
        (4, OTHER, "en"),
        (5, "tiny", "en"),      # < 3 tokens -> empty shingle set
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup_groups(docs):
    out = {r["kept_doc_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2          # docs 1+2 collapse, keep min id
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO   WORLD ")],
        ["doc_id", "text"],
    )
    out = exact_dedup(df).collect()
    assert len(out) == 1 and out[0]["n_dups"] == 3


def test_jaccard_identical_is_one(docs, spark):
    sh = docs.select("doc_id", shingles("text").alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    row = (
        a.join(b, (F.col("a.doc_id") == 1) & (F.col("b.doc_id") == 2))
        .select(jaccard(F.col("a.s"), F.col("b.s")).alias("j"))
        .collect()[0]
    )
    assert row["j"] == 1.0


def test_ngram_pairs_rank_near_dup_above_unrelated(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] > 0.5
    assert out.get((1, 4), 0.0) < 0.05


def test_ngram_stop_shingle_cap_bounds_candidates(spark):
    """Skewed corpus: every doc shares one boilerplate shingle, so the
    uncapped posting join emits all C(n,2) pairs from that single key.
    max_doc_freq drops the hot shingle, leaving only the genuinely
    overlapping pair — bounded candidates under skew."""
    boiler = "all rights reserved worldwide"   # 4 tokens -> 2 shingles, in every doc
    rows = [(i, "en", f"{boiler} unique{i} filler{i} pad{i} tail{i}") for i in range(1, 9)]
    # docs 100/101: genuine near-dups beyond the boilerplate
    rows += [
        (100, "en", f"{boiler} the quick brown fox jumps over lazy dogs"),
        (101, "en", f"{boiler} the quick brown fox jumps over lazy dogs"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    uncapped = ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert len(uncapped) == 45  # C(10,2): every pair co-occurs via boilerplate

    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=5).collect()}
    assert (100, 101) in capped and capped[(100, 101)] == 1.0
    assert len(capped) == 1  # boilerplate-only pairs are gone


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs          # near-dup shares at least one band
    assert (1, 4) not in pairs      # unrelated doc never co-buckets


def test_simhash_identical_equal_and_near_close(docs):
    out = {r["doc_id"]: r["simhash"] for r in
           docs.select("doc_id", simhash32("text").alias("simhash")).collect()}
    assert out[1] == out[2]
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def test_contamination_self_and_disjoint(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        contamination_report,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    some = docs.limit(20)
    # eval == train -> every doc fully contaminated
    full = contamination_report(some, some)
    assert full.count() > 0
    assert full.filter(F.col("contamination") < 1.0).count() == 0
    # eval with no shared vocabulary -> zero contamination
    import pyspark.sql.functions as SF

    alien = spark.createDataFrame(
        [(1, "zzq qqz zqz qzz zzz qqq")], ["doc_id", "text"]
    )
    none = contamination_report(some, alien)
    assert none.filter(SF.col("shared") > 0).count() == 0


def test_minhash_rejects_degenerate_banding(docs):
    """bands > num_hashes would make every band key md5('') — one
    global bucket, i.e. the full O(n^2) cross product."""
    import pytest

    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        minhash_lsh_pairs,
    )

    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=32)
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="positive"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=0)


# ---- SimHash banded-Hamming near-dup ---------------------------------------

def test_simhash_hamming_pairs_pigeonhole_recall(spark):
    """Signatures within the hamming budget are ALWAYS found (the
    banding is recall-complete for max_hamming < n_bands), and pairs
    beyond it never appear."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        simhash_hamming_pairs,
    )

    sigs = spark.createDataFrame(
        [
            (1, 0b1111_0000_1010_0101_0000_1111_0101_1010),
            (2, 0b1111_0000_1010_0101_0000_1111_0101_1011),  # hamming 1 vs #1
            (3, 0b1111_0000_1010_0101_0000_1111_0101_1010),  # hamming 0 vs #1
            (4, 0b0000_1111_0101_1010_1111_0000_1010_0101),  # far from all
        ],
        ["doc_id", "simhash"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(
            sigs, n_bands=2, band_bits=16, max_hamming=1
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 0, (2, 3): 1}


def test_simhash_hamming_pairs_rejects_unsound_banding(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        simhash_hamming_pairs,
    )

    sigs = spark.createDataFrame([(1, 7)], ["doc_id", "simhash"])
    with pytest.raises(ValueError, match="recall-complete"):
        simhash_hamming_pairs(sigs, n_bands=2, band_bits=16, max_hamming=2)


# ---- containment pairs ------------------------------------------------------

def test_containment_catches_subset_jaccard_misses(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    base = " ".join(f"w{i}" for i in range(100))
    excerpt = " ".join(f"w{i}" for i in range(10, 20))
    rows = [
        (1, base, "en"),
        (2, excerpt, "en"),  # fully contained in doc 1
        (3, "совсем другой текст на другом языке тут", "ru"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    jac = ngram_jaccard_pairs(df, threshold=0.3).collect()
    cont = ngram_containment_pairs(df, threshold=0.9).collect()
    assert jac == []  # 8/98 shared shingles: invisible to jaccard
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_a"], r["doc_b"], r["containment"]) == (1, 2, 1.0)


def test_minhash_bucket_ceiling_skips_giant_cluster(spark):
    """A band bucket above max_bucket_size is excluded from the pair
    join (the O(n^2)-per-bucket guard) and surfaced by the overflow
    report; smaller clusters are unaffected, and None disables the
    ceiling entirely."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
        minhash_lsh_bucket_overflow,
    )

    giant = [(i, BASE, "en") for i in range(1, 21)]          # 20 identical
    small = [(100 + i, OTHER, "en") for i in range(3)]       # 3 identical
    docs = spark.createDataFrame(giant + small, ["doc_id", "text", "lang"])

    capped = minhash_lsh_pairs(docs, max_bucket_size=10).collect()
    # the 20-doc cluster's buckets (size 20 > 10) are skipped ...
    assert all(r["doc_a"] >= 100 for r in capped)
    # ... while the 3-doc cluster still pairs fully
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {
        (100, 101), (100, 102), (101, 102)
    }

    # overflow report: every band of the giant cluster, none of the small
    over = minhash_lsh_bucket_overflow(docs, max_bucket_size=10).collect()
    assert len(over) == 8  # all 8 bands hold the same 20 identical docs
    assert all(r["bucket_n"] == 20 and r["sample_doc_id"] == 1 for r in over)

    # ceiling disabled -> the giant cluster pairs all-vs-all
    full = minhash_lsh_pairs(docs, max_bucket_size=None).collect()
    giant_pairs = {(r["doc_a"], r["doc_b"]) for r in full if r["doc_a"] < 100}
    assert len(giant_pairs) == 20 * 19 // 2

    # the default ceiling (512) sits far above the max bucket observed
    # at the certified SFs (3 at sf0.01, 9 at sf0.1, 65 at sf1), so
    # certified-query parity is unaffected; this fixture would need
    # >512 identical docs to trip it.
    dflt = minhash_lsh_pairs(docs).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in dflt} == {
        (r["doc_a"], r["doc_b"]) for r in full
    }
