"""Training-data sampling queries over the documents/events tables:
deterministic split assignment, exact stratified sampling, and
per-origin capping.  All three are oracle-checked — the split hash
is plain modular arithmetic (functions/sampling.py) that DuckDB
evaluates identically.

Reference parity context: north-star training-pipeline scope
(SURVEY.md §2.11); the reference itself has no sampling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    hash_split,
    lcg_bucket,
    per_group_cap,
    sql_lcg_bucket,
    stratified_sample,
)
from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table


# ---- deterministic train/valid/test split ----------------------------------

def q_doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        # lcg hasher so the DuckDB twin reproduces the assignment;
        # production default is xxhash_bucket (not SQL-portable)
        hash_split(docs, "doc_id", hasher=lcg_bucket)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


register(
    "doc_hash_split",
    q_doc_hash_split,
    f"""
    SELECT CASE WHEN {sql_lcg_bucket('doc_id')} < 80 THEN 'train'
                WHEN {sql_lcg_bucket('doc_id')} < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)


# ---- exact stratified sample (per-language) --------------------------------

def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sample = stratified_sample(
        docs, stratum="lang", key="doc_id", fraction=0.1, hasher=lcg_bucket
    )
    return sample.select("doc_id", "lang").orderBy("doc_id")


register(
    "doc_stratified_sample",
    q_doc_stratified_sample,
    # rank on the FULL-WIDTH hash and cut at exact integer
    # arithmetic on the 1e-6-quantized fraction — the operator's
    # contract (functions/sampling.py::stratified_sample)
    f"""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {sql_lcg_bucket('doc_id', 2_147_483_648)}, doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    WHERE rn <= (n * 100000 + 999999) // 1000000
    ORDER BY doc_id
    """,
)


# ---- per-origin cap (anti-domination) --------------------------------------

def q_events_per_user_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    capped = per_group_cap(events, group="user_id", order_by=["ts", "event_id"], cap=5)
    return (
        capped.groupBy("user_id")
        .agg(F.count("*").alias("kept"), F.min("ts").alias("first_ts"))
        .orderBy("user_id")
    )


register(
    "events_per_user_cap",
    q_events_per_user_cap,
    """
    SELECT user_id, COUNT(*) AS kept, MIN(ts) AS first_ts
    FROM (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn <= 5
    GROUP BY user_id
    ORDER BY user_id
    """,
)


# ---- concat-and-chunk sequence packing -------------------------------------

def q_doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        pack_chunks,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    packed = pack_chunks(
        docs, order_col="doc_id", tokens_col="n_tokens", budget=512, bucket_size=1000
    )
    return packed.select("doc_id", "n_tokens", "start_chunk", "end_chunk").orderBy(
        "doc_id"
    )


register(
    "doc_pack_chunks",
    q_doc_pack_chunks,
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS excl
      FROM t
    )
    SELECT doc_id, n_tokens,
           excl // 512 AS start_chunk,
           (excl + n_tokens - 1) // 512 AS end_chunk
    FROM c
    ORDER BY doc_id
    """,
)


# ---- data-mixture sampling (epoch weights per source) ----------------------

# LLaMA/Pile-style mixture: multi-epoch, exactly-once, fractional,
# and defaulted sources all exercised.  Weights live here so the SQL
# twin is generated from the same dict.
_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.4, "src3": 0.0}
_MIX_DEFAULT = 0.25


def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = mixture_sample(
        docs, "doc_id", _MIX_WEIGHTS, default=_MIX_DEFAULT, hasher=lcg_bucket
    )
    # reduce to a per-source audit so the certified row set stays
    # small while still pinning every copy (sum of copy_idx detects
    # any miscounted epoch)
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_rows_out"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("copy_idx").cast("bigint").alias("copy_idx_sum"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


def _mixture_sql() -> str:
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        sql_mixture_n_copies,
    )

    n = sql_mixture_n_copies("doc_id", "source", _MIX_WEIGHTS, _MIX_DEFAULT)
    return f"""
    WITH counted AS (
      SELECT doc_id, source, n_chars, {n} AS n_copies FROM documents
    ),
    expanded AS (
      SELECT doc_id, source, n_chars,
             unnest(range(0, n_copies)) AS copy_idx
      FROM counted WHERE n_copies > 0
    )
    SELECT source,
           COUNT(*) AS n_rows_out,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(copy_idx) AS BIGINT) AS copy_idx_sum,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM expanded GROUP BY source ORDER BY source
    """


register("doc_mixture_sample", q_doc_mixture_sample, _mixture_sql())


# ---- row-level split leakage report ----------------------------------------
# The QA check that catches the classic eval-contamination mistake:
# splitting at the EVENT level sends different rows of the same user
# into train and test, so "held-out" users aren't held out at all.
# This report quantifies it — per-split row counts for every user
# whose rows span >= 2 splits, worst (most-rows) offenders first.
# The correct fix is splitting on the entity key (hash_split on
# user_id, as doc_hash_split does on doc_id); this query is the
# detector that proves why.  ONE shuffle on user_id (the split tag
# is a narrow map); output capped at the top 100 offenders with a
# (total, user_id) total order.

_LEAK_TOP = 100


def q_events_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = hash_split(ev, "event_id", hasher=lcg_bucket)
    per_user = tagged.groupBy("user_id").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("split") == "valid", 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
    )
    n_splits = (
        (F.col("n_train") > 0).cast("int")
        + (F.col("n_valid") > 0).cast("int")
        + (F.col("n_test") > 0).cast("int")
    )
    total = F.col("n_train") + F.col("n_valid") + F.col("n_test")
    return (
        per_user.select(
            "user_id", "n_train", "n_valid", "n_test",
            n_splits.alias("n_splits"), total.alias("total_rows"),
        )
        .filter(F.col("n_splits") >= 2)
        .orderBy(F.col("total_rows").desc(), F.col("user_id").asc())
        .limit(_LEAK_TOP)
    )


register(
    "events_split_leakage",
    q_events_split_leakage,
    f"""
    WITH tagged AS (
      SELECT user_id,
             CASE WHEN {sql_lcg_bucket('event_id')} < 80 THEN 'train'
                  WHEN {sql_lcg_bucket('event_id')} < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
             CAST(SUM(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      FROM tagged GROUP BY 1
    )
    SELECT user_id, n_train, n_valid, n_test,
           CAST((n_train > 0) AS INT) + CAST((n_valid > 0) AS INT)
             + CAST((n_test > 0) AS INT) AS n_splits,
           n_train + n_valid + n_test AS total_rows
    FROM per_user
    WHERE CAST((n_train > 0) AS INT) + CAST((n_valid > 0) AS INT)
          + CAST((n_test > 0) AS INT) >= 2
    ORDER BY total_rows DESC, user_id ASC
    LIMIT {_LEAK_TOP}
    """,
)


# ---- Stratified k-fold assignment report -----------------------------------
# Cross-validation folds with the same leakage discipline as
# hash_split: fold membership is pure key arithmetic (LCG bucket mod
# k — no RNG, repartition/rerun-proof), so a document can never
# migrate folds between materializations.  The certified row reports
# per-language fold balance: a fold whose size strays from n/k by
# more than the hash's natural variance is the signal the splitter
# or the key is broken.  One (lang, fold) shuffle; O(langs) output.

_CV_K = 5


def q_doc_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    folds = docs.select(
        "lang", lcg_bucket("doc_id", _CV_K).alias("fold")
    )
    per = folds.groupBy("lang", "fold").agg(F.count("*").alias("n"))
    return (
        per.groupBy("lang")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count("*").alias("folds_used"),
            F.min("n").alias("min_fold_n"),
            F.max("n").alias("max_fold_n"),
        )
        .select(
            "lang", "n_docs", "folds_used", "min_fold_n", "max_fold_n",
            F.expr("(max_fold_n - min_fold_n) * 1000000 div n_docs").alias(
                "spread_ppm"
            ),
        )
        .orderBy("lang")
    )


register(
    "doc_cv_folds",
    q_doc_cv_folds,
    f"""
    WITH folds AS (
      SELECT lang, {sql_lcg_bucket("doc_id", _CV_K)} AS fold
      FROM documents WHERE doc_id IS NOT NULL
    ),
    per AS (SELECT lang, fold, COUNT(*) AS n FROM folds GROUP BY 1, 2)
    SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS folds_used,
           MIN(n) AS min_fold_n, MAX(n) AS max_fold_n,
           ((MAX(n) - MIN(n)) * 1000000) // CAST(SUM(n) AS BIGINT) AS spread_ppm
    FROM per GROUP BY lang
    ORDER BY lang
    """,
)


# ---- deterministic global shuffle + shard assignment ------------------------
# The LAST stage of a training-data pipeline: fix a pseudo-random
# training ORDER and shard layout (doc -> shard, position-in-shard)
# so every rerun writes byte-identical shards.  Order is the full
# 31-bit LCG hash (tie-broken by doc_id); shards interleave by
# hash % n.
#
# Scale shape (the operators/rank.py discipline): a naive
# ``row_number() OVER (PARTITION BY shard ...)`` puts an entire
# 1/n_shards slice of the corpus on ONE task.  Instead rows rank
# inside (shard, hash-range bucket) cells — fully parallel — and the
# per-cell counts (an O(shards x buckets) relation) prefix-sum into
# offsets that broadcast back.  The oracle certifies the composition
# against DuckDB's plain partitioned row_number(): same positions,
# radically different plan.
_SHUF_SHARDS = 8
_SHUF_HBUCKETS = 64

from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (  # noqa: E402
    LCG_A, LCG_C, LCG_M,
)
from pyspark.sql import Window  # noqa: E402


def q_doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    step = LCG_M // _SHUF_HBUCKETS
    d = docs.select(
        "doc_id",
        F.pmod(
            F.col("doc_id").cast("bigint") * LCG_A + LCG_C, F.lit(LCG_M)
        ).alias("__h"),
    ).select(
        "doc_id", "__h",
        (F.col("__h") % _SHUF_SHARDS).cast("bigint").alias("shard"),
        F.expr(f"__h div {step}").alias("__hb"),
    )
    w_in = Window.partitionBy("shard", "__hb").orderBy(
        F.col("__h").asc(), F.col("doc_id").asc()
    )
    ranked = d.withColumn("__rn", F.row_number().over(w_in))
    totals = d.groupBy("shard", "__hb").agg(F.count("*").alias("__bn"))
    w_off = (
        Window.partitionBy("shard")
        .orderBy("__hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).select("shard", "__hb", "__off")
    return (
        ranked.join(F.broadcast(offsets), ["shard", "__hb"])
        .select(
            "doc_id",
            "shard",
            (F.col("__off") + F.col("__rn")).cast("bigint").alias("pos"),
        )
    )


register(
    "doc_global_shuffle",
    q_doc_global_shuffle,
    f"""
    WITH h AS (
      SELECT doc_id,
             {sql_lcg_bucket("doc_id", LCG_M)} AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(h % {_SHUF_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY h % {_SHUF_SHARDS} ORDER BY h, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """,
)


# ---- corpus sampling plan ------------------------------------------------------
# The allocation REPORT a mixture run is configured from (the
# planning half of mixture_sample): given fixed target token shares
# per language, compare each stratum's available whitespace tokens to
# its target slice of a fixed total budget and emit the sampling rate
# (or the epoch count when undersupplied — data shortage means
# repetition, the Hoffmann-scaling tradeoff the report surfaces).
# All arithmetic integer: token counts, ppm rates, centi-epochs.
_PLAN_BUDGET_TOKENS = 50_000
_PLAN_SHARES_PPM = {  # fixed editorial mixture, sums to 1e6
    "en": 400_000, "de": 150_000, "fr": 150_000, "es": 150_000,
    "zh": 150_000,
}


def q_doc_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(T.token_count("text")).cast("bigint").alias("tokens"),
    )
    share = None
    for lang, ppm in _PLAN_SHARES_PPM.items():
        share = (
            F.when(F.col("lang") == lang, ppm)
            if share is None
            else share.when(F.col("lang") == lang, ppm)
        )
    share = share.otherwise(0).cast("bigint")
    planned = avail.select(
        "lang", "n_docs", "tokens",
        (share * _PLAN_BUDGET_TOKENS).alias("__target_u"),
    ).select(
        "lang", "n_docs", "tokens",
        F.expr("__target_u div 1000000").alias("target_tokens"),
    )
    return planned.select(
        "lang", "n_docs", "tokens", "target_tokens",
        # oversupplied -> sample at rate < 1e6; undersupplied -> rate
        # pins at 1e6 and epochs > 100 centi-epochs signal repetition
        F.expr(
            "CASE WHEN tokens >= target_tokens"
            " THEN target_tokens * 1000000 div tokens"
            " ELSE CAST(1000000 AS BIGINT) END"
        ).alias("rate_ppm"),
        F.expr(
            "CASE WHEN tokens > 0 THEN target_tokens * 100 div tokens"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("centi_epochs"),
    ).orderBy("lang")


def _sampling_plan_sql() -> str:
    case = "".join(
        f" WHEN lang = '{lang}' THEN {ppm}"
        for lang, ppm in _PLAN_SHARES_PPM.items()
    )
    return f"""
    WITH avail AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY lang
    ),
    planned AS (
      SELECT lang, n_docs, tokens,
             (CAST(CASE{case} ELSE 0 END AS BIGINT)
              * {_PLAN_BUDGET_TOKENS}) // 1000000 AS target_tokens
      FROM avail
    )
    SELECT lang, n_docs, tokens, target_tokens,
           CASE WHEN tokens >= target_tokens
                THEN target_tokens * 1000000 // tokens
                ELSE CAST(1000000 AS BIGINT) END AS rate_ppm,
           CASE WHEN tokens > 0 THEN target_tokens * 100 // tokens
                ELSE CAST(0 AS BIGINT) END AS centi_epochs
    FROM planned ORDER BY lang
    """


register("doc_sampling_plan", q_doc_sampling_plan, _sampling_plan_sql())


# ---- Weight-proportional deterministic sampling (batch 60) ------------------
# Poisson/Bernoulli sampling with per-doc inclusion probability
# proportional to document LENGTH (chars as the token proxy):
# p_i = min(1, n_target * w_i / W), the standard first-order
# pps design — long documents carry more training tokens, so a
# token-budgeted subsample wants them kept with higher probability,
# the classic alternative to the uniform doc_stratified_sample.
#
# Determinism/exactness: p_i is computed in pure BIGINT ppm
# arithmetic (w_i * n_target * 1e6 DIV W — no float division), and
# the coin is the portable lcg hash over [0, 1e6), so Spark and
# DuckDB pick the IDENTICAL sample.  Scale shape: one map-side-
# combinable global SUM (1 row, broadcast back — the documented
# scalar-attach pattern), then a map-only score-and-tag pass and one
# O(sources) rollup.  Nothing corpus-sized shuffles.
#
# Overflow bound: w_i <= 2^20 chars, n_target <= 2^20 docs keeps
# w_i * n_target * 1e6 < 2^60 inside BIGINT.

_WS_TARGET_DOCS = 200


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars").cast("bigint").alias("_w_total"))
    scored = (
        docs.crossJoin(F.broadcast(total))
        .withColumn(
            "p_ppm",
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr(
                    f"CAST((n_chars * {_WS_TARGET_DOCS} * 1000000)"
                    " DIV _w_total AS BIGINT)"
                ),
            ),
        )
        .withColumn(
            "sampled",
            (lcg_bucket("doc_id", 1000000) < F.col("p_ppm")).cast("bigint"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("sampled").cast("bigint").alias("n_sampled"),
            F.sum(F.col("sampled") * F.col("n_chars"))
            .cast("bigint")
            .alias("sampled_chars"),
            F.sum("p_ppm").cast("bigint").alias("expected_ppm_sum"),
        )
        .orderBy("source")
    )


register(
    "doc_weighted_sample",
    q_doc_weighted_sample,
    f"""
    WITH tot AS (
      SELECT CAST(SUM(n_chars) AS BIGINT) AS _w_total FROM documents
    ),
    scored AS (
      SELECT source, n_chars,
             LEAST(CAST(1000000 AS BIGINT),
                   (CAST(n_chars AS BIGINT) * {_WS_TARGET_DOCS} * 1000000)
                     // _w_total) AS p_ppm,
             {sql_lcg_bucket('doc_id', 1000000)} AS h
      FROM documents, tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h < p_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN h < p_ppm THEN n_chars ELSE 0 END) AS BIGINT)
             AS sampled_chars,
           CAST(SUM(p_ppm) AS BIGINT) AS expected_ppm_sum
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
