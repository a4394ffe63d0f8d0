"""Deduplication operators for the training-data pipeline:

- exact dedup: hash-groupBy on a content fingerprint (one shuffle on
  the 128-bit key; at 100 TB this is the minimal-possible plan).
- word-shingle construction + n-gram Jaccard similarity.
- MinHash signatures + LSH banding, built from portable md5-based
  hash families so the SAME algorithm is expressible in the DuckDB
  oracle.  The LSH band join turns the O(n^2) all-pairs problem into
  an equi-join on (band_idx, band_key) — the scale path: candidate
  generation is a shuffle on band keys, verification touches only
  co-bucketed pairs.
- SimHash (32-bit) via per-token hashes folded bit-wise — integer
  arithmetic only, so engine-portable and shuffle-free.

No UDFs anywhere: everything is Column-expression higher-order
functions (transform/aggregate/array_*), JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.text import fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per identical (normalized) text.
    Returns (kept id, fingerprint, group size)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("kept_" + id_col),
            F.count("*").alias("n_dups"),
        )
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles. Empty array when the document has
    fewer than k tokens."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)  # first token index of each shingle
    parts = lambda i: [i + j for j in range(k)]

    def shingle_at(i: Column) -> Column:
        out = toks[i]
        for j in range(1, k):
            out = F.concat(out, F.lit(" "), toks[i + j])
        return out

    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle_at))).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays (exact
    integer set sizes -> one double division: deterministic)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    # try_divide: NULL on 0/0 (two empty shingle sets), matching
    # DuckDB's double-division semantics so the oracle agrees.
    return F.try_divide(inter, union).cast("double")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """All-pairs n-gram Jaccard within blocking-key groups.  The
    blocking key bounds the quadratic blow-up; for unblocked corpora
    use minhash_lsh_pairs instead."""
    sh = df.select(
        F.col(id_col), F.col(block_col), shingles(text_col, k).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(sh: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of ``num_hashes`` hex strings:
    element j is min over shingles s of md5(j || ':' || s).  The md5
    family is portable (identical in DuckDB), and string-min is
    order-independent.

    Note: fine for one-off signatures, but the array expression tree
    re-derives the shingle array per hash family; for corpus-scale
    signature computation use the explode/groupBy path inside
    minhash_lsh_pairs, which computes each shingle hash once and
    aggregates with map-side partial mins."""
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    signature (num_hashes mins) -> bands of rows=num_hashes/bands ->
    band key = md5(concat(band slice)).  Docs sharing any band key
    become candidates; candidates are scored by signature agreement
    (estimated Jaccard).  Plan shape: one narrow map to build
    signatures, one explode to (band_idx, band_key, id), one shuffle
    join on the band key, one distinct — no all-pairs stage.
    """
    rows = num_hashes // bands
    # Scalable signature computation: explode shingles (duplicates
    # don't affect the min, so no distinct needed), hash each shingle
    # once per family, aggregate per-doc mins (map-side partial agg,
    # one shuffle on the doc id).
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("s")
    )
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("s")))).alias(f"mh{j}")
            for j in range(num_hashes)
        ]
    )
    sig = mins.select(
        id_col, F.array(*[F.col(f"mh{j}") for j in range(num_hashes)]).alias("sig")
    )
    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws("|", *[F.col("sig")[b * rows + r] for r in range(rows)])
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sig", "band.band_idx", "band.band_key")
    # Materialize once instead of re-deriving on both join sides.
    banded = banded.cache()
    a = banded.alias("a")
    b = banded.alias("b")
    # estimated Jaccard = fraction of agreeing signature positions
    agree = F.aggregate(
        F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            (agree / F.lit(num_hashes)).cast("double").alias("est_jaccard"),
        )
        .distinct()
    )


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash over whitespace tokens.  Per-token hash = first
    8 hex chars of md5 as an integer; bit b of the output is 1 iff
    the sum over tokens of (+1 / -1 for bit b set / unset) is
    positive.  Pure integer arithmetic -> engine-portable."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"))

    def bit_term(b: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for b in range(32):
        out = out + F.when(bit_term(b) > 0, F.lit(2 ** b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out
