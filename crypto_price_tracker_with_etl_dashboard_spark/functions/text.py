"""Text-analysis column builders for the training-data pipeline:
tokenization, token counting, quality scoring, language-ID heuristic,
document fingerprinting.  All pure JVM-side Column expressions (no
UDFs) so they fuse into whole-stage codegen and scale linearly with
the corpus — at 100 TB these run as a single map stage over the
document partitions with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword language-ID
# heuristic.  Deterministic tie order: en > es > fr > de > zh.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization.  Matches DuckDB's
    string_split_regex(text, '\\s+') for already-normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def normalized_text(text: Column | str) -> Column:
    """lower + collapse runs of whitespace + trim: canonical form for
    fingerprinting and exact dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex).
    Stable across engines; used as the exact-dedup key."""
    return F.md5(normalized_text(text))


def marker_hits(text: Column | str, lang: str) -> Column:
    """Number of distinct language-marker words present."""
    return F.size(
        F.array_intersect(tokens(text), F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]))
    )


def lang_guess(text: Column | str) -> Column:
    """Heuristic language ID: the language whose marker-word set has
    the most distinct hits; ties resolved in fixed priority order;
    'und' (undetermined) when nothing matches."""
    hits = {lang: marker_hits(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # Build CASE from lowest priority up so highest priority wins ties.
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no \p
# classes, no lookarounds.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: contraction suffixes, letter runs,
    digit runs, punctuation runs (each with optional leading space) —
    the shape of byte-pair-encoder input segmentation, engine-portable."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def gram_hashes(text: Column | str, k: int = 5) -> Column:
    """32-bit hashes of all character k-grams (md5-prefix stand-in
    for a Rabin-Karp rolling hash: same sliding-window semantics,
    engine-portable values; swap in a true rolling hash kernel when
    hashing throughput dominates).  Empty when len(text) < k."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c) - k + 1
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.conv(F.substring(F.md5(c.substr(i, F.lit(k))), 1, 8), 16, 10).cast(
                "bigint"
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_fingerprints(hashes: Column, w: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): the distinct set of
    per-window minima over a MATERIALIZED k-gram hash array — the
    standard local document fingerprint for plagiarism/near-dup
    detection.  Guarantees every match of length >= w+k-1 shares a
    fingerprint.  Row-local: zero shuffle at corpus scale."""
    n_win = F.size(hashes) - w + 1
    return F.when(
        n_win >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda j: F.array_min(F.slice(hashes, j + 1, w)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: char/token counts, mean token
    length, punctuation ratio, stopword ratio.  Integer/ratio
    arithmetic only — deterministic across engines."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    n_punct = n_char - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]))
    )
    return {
        "n_chars": n_char.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "mean_token_len": (
            (n_char - (n_tok - F.lit(1))) / n_tok
        ).cast("double"),
        "punct_ratio": (n_punct / n_char).cast("double"),
        "distinct_stopwords": n_stop.cast("bigint"),
    }


# ---- PII scrubbing (C4-style) ----------------------------------------------
# Patterns kept alternation-free and anchored with \b so Java regex
# (Spark, leftmost-first) and RE2 (DuckDB, leftmost-longest) produce
# identical matches — the two dialects only diverge on alternation /
# backtracking constructs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def scrub_pii(text: Column | str) -> Column:
    """Redact emails -> <EMAIL>, then IPv4s -> <IP>, then
    NNN-NNN-NNNN phones -> <PHONE>.  Replacement ORDER is part of the
    contract (emails contain dots and digits that the later patterns
    could otherwise partially match); counts taken at each stage must
    therefore run on the progressively-scrubbed text.  Pure Column
    expressions — a zero-shuffle map stage at any scale."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts, each counted on the text AFTER the
    preceding kinds were redacted (mirrors scrub_pii's order)."""
    c = F.col(text) if isinstance(text, str) else text
    n_emails = F.regexp_count(c, F.lit(PII_EMAIL_RE))
    after_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IPV4_RE))
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    n_phones = F.regexp_count(after_ip, F.lit(PII_PHONE_RE))
    return {"n_emails": n_emails, "n_ips": n_ips, "n_phones": n_phones}


# ---- Repetition scoring (Gopher-style) -------------------------------------

def word_array(text: Column | str) -> Column:
    """Split on single spaces — the deterministic tokenization shared
    with the SQL twin (documents are single-space joined)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def bigram_array(text: Column | str) -> Column:
    """Adjacent word pairs as 'w1 w2' strings, pure Column exprs
    (sequence + transform over the word array; empty when the doc has
    fewer than 2 words — Spark's sequence() would otherwise count
    DOWN from 0 to a negative stop)."""
    words = word_array(text)
    n2 = F.size(words) - F.lit(1)
    grams = F.transform(
        F.sequence(F.lit(0), n2 - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return F.when(n2 > 0, grams).otherwise(F.array().cast("array<string>"))


def repetition_features(text: Column | str) -> dict[str, Column]:
    """Duplicate-fraction repetition signals (Gopher / MassiveText
    quality rules): 1 - distinct/total for words and for adjacent
    bigrams.  A heavily-repeated document scores high and gets
    filtered before training.  Zero shuffle — array ops per row."""
    words = word_array(text)
    grams = bigram_array(text)
    n_words = F.size(words)
    n_grams = F.size(grams)
    return {
        "n_words": n_words.cast("bigint"),
        "dup_word_frac": F.round(
            F.lit(1.0) - F.size(F.array_distinct(words)) / n_words, 6
        ),
        "n_bigrams": n_grams.cast("bigint"),
        "dup_bigram_frac": F.when(
            n_grams > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / n_grams, 6),
        ),
    }


def bm25_topk(
    docs,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Okapi BM25 top-k for a fixed query-term set (Robertson et al.,
    TREC-3): score(d) = sum_t idf(t) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Scale shape: one tokenize pass feeds the doc-length table and the
    (query-terms-only) tf table; df/N/avgdl collapse to 1-row
    broadcasts; scoring is a broadcast join + fixed-order column
    expression, and the global top-k is a distributed TakeOrdered
    (orderBy+limit) — never a single-partition window over the
    corpus.  The corpus shuffles once on the doc id.

    Determinism: per-term contributions pivot into FIXED columns and
    sum in query-term order (a groupBy-sum over term rows would
    re-associate doubles non-deterministically); callers rank on the
    6dp-rounded score so a last-ulp ln() divergence between engines
    cannot reorder the top-k."""
    from pyspark.sql import DataFrame, Window

    assert isinstance(docs, DataFrame)
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(set(query_terms)) != len(query_terms):
        # A duplicated term would build two identical tf pivot columns
        # and add its contribution twice (this implementation omits
        # the query-term-frequency weight; de-dup upstream if qtf
        # weighting is wanted).
        raise ValueError(f"duplicate query terms: {query_terms}")
    terms = docs.select(
        id_col, F.explode_outer(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    stats = dl.agg(F.sum("dl").alias("_sum_dl")).crossJoin(n_docs).select(
        "n_docs",
        (F.col("_sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    tf = (
        terms.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").alias("df")).groupBy().agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("df"))).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    per_doc = tf.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf"))).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    base = (
        per_doc.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfs))
    )

    def contrib(i: int) -> Column:
        tf_i = F.col(f"tf_{i}")
        df_i = F.coalesce(F.col(f"df_{i}"), F.lit(0))
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_i + F.lit(0.5)) / (df_i + F.lit(0.5))
        )
        denom = tf_i.cast("double") + F.lit(k1) * (
            F.lit(1.0) - F.lit(b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            tf_i.isNotNull(),
            idf * tf_i.cast("double") * F.lit(k1 + 1) / denom,
        ).otherwise(F.lit(0.0))

    score = F.lit(0.0)
    for i in range(len(query_terms)):
        score = score + contrib(i)
    scored = base.select(id_col, F.round(score, 6).alias("score"))
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "score", "rnk"
    )
