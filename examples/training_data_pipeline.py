"""End-to-end LLM training-data curation pipeline — a worked
composition of the engine's document operators, in the order a real
corpus run applies them:

  1. quality + language screen   (functions/text.py, zero-shuffle)
  2. PII scrub                   (functions/text.py, zero-shuffle)
  3. exact dedup, keep lowest id (functions/dedup.py, 1 shuffle)
  4. consensus near-dup clustering (MinHash-LSH pairs confirmed by
                                  embedding cosine -> connected
                                  components -> keep cluster min —
                                  the doc_emb_consensus_dedup
                                  pattern)
  5. benchmark decontamination   (broadcast eval shingles)
  6. eval-side leak report       (which benchmark items to DROP from
                                  the eval set itself — the GPT-3
                                  appendix-C mirror of stage 5)
  7. token-budgeted pps downsample (length-weighted inclusion in
                                  exact BIGINT ppm — keeps the long
                                  documents a token budget wants)
  8. deterministic train/valid/test split (no RNG, repartition-proof)
  9. sequence packing            (distributed prefix sum)

Run:  python examples/training_data_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints per-stage survivor counts
and the packed-chunk summary).

Every stage is a lazy DataFrame transformation — the whole pipeline
is ONE Catalyst plan per action, and each stage's scale shape is
documented in SCALE.md's shuffle inventory.  The same composition
certified piecewise by the driver-oracle rows (doc_quality,
doc_exact_dedup, doc_minhash_lsh, doc_emb_consensus_dedup,
doc_dup_clusters,
doc_decontaminate, doc_eval_contamination, doc_weighted_sample,
doc_hash_split, doc_pack_chunks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions import dedup as D
from crypto_price_tracker_with_etl_dashboard_spark.functions import similarity as S
from crypto_price_tracker_with_etl_dashboard_spark.functions import text as T
from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
    hash_split,
    pack_chunks,
    xxhash_bucket,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.components import (
    connected_components,
)
from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table


def curate(spark, sf_dir: str, *, min_tokens: int = 5, lang: str = "en",
           max_contamination: float = 0.5, chunk_budget: int = 256):
    docs = load_table(spark, sf_dir, "documents")
    stats = {"input": docs.count()}

    # 1. quality + language screen (all zero-shuffle column exprs)
    feats = T.quality_features("text")
    screened = (
        docs.withColumn("n_tokens", feats["n_tokens"])
        .withColumn("lang_guess", T.lang_guess("text"))
        .filter(
            (F.col("n_tokens") >= min_tokens) & (F.col("lang_guess") == lang)
        )
    )
    stats["after_quality_lang"] = screened.count()

    # 2. PII scrub (in place; counts are available via pii_counts)
    screened = screened.withColumn("text", T.scrub_pii("text"))

    # 3. exact dedup: keep the lowest doc_id per identical content
    keep_exact = D.exact_dedup(screened).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    exact_kept = screened.join(keep_exact, "doc_id")
    stats["after_exact_dedup"] = exact_kept.count()

    # 4. near-dup clustering with CONSENSUS confirmation (the
    #    doc_emb_consensus_dedup pattern, batch 64): a pair must clear
    #    the text channel (LSH jaccard) AND the semantic channel
    #    (embedding cosine on the aligned doc_id/vec_id key space)
    #    before it can merge two docs into one dedup cluster —
    #    template pages with swapped entities pass LSH but fail
    #    cosine and survive.  Then connected components -> drop every
    #    doc that is not its cluster's min.
    pairs = D.minhash_lsh_pairs(exact_kept).filter(F.col("est_jaccard") >= 0.8)
    emb = load_table(spark, sf_dir, "embeddings")
    # The inner joins below assume full doc_id/vec_id coverage — a
    # doc with no embedding row would silently lose its candidate
    # pairs (exempting it from near-dup dedup), so ENFORCE coverage
    # at load time instead of assuming it (r10 ADVICE).  On a
    # partial-coverage corpus, left-join and treat a missing
    # embedding as consensus=0 (the doc_emb_consensus_dedup pattern).
    uncovered = (
        exact_kept.select("doc_id")
        .join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti")
        .count()
    )
    if uncovered:
        raise ValueError(
            f"{uncovered} surviving docs have no embedding row; the "
            "consensus stage would silently exempt them from dedup"
        )
    ea = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("__ea"))
    eb = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("__eb"))
    pairs = (
        pairs.join(ea, "doc_a")
        .join(eb, "doc_b")
        .filter(S.cosine(F.col("__ea"), F.col("__eb")) >= 0.3)
        .select("doc_a", "doc_b")
    )
    stats["consensus_pairs"] = pairs.count()
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    neardup_kept = exact_kept.join(losers, "doc_id", "left_anti")
    stats["after_near_dedup"] = neardup_kept.count()

    # 5. decontamination against a held-out eval slice (here: every
    #    50th doc id stands in for the benchmark corpus — swap in
    #    the real eval set in production)
    eval_df = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    report = D.contamination_report(neardup_kept, eval_df)
    dirty = report.filter(F.col("contamination") > max_contamination).select(
        "doc_id"
    )
    clean = neardup_kept.join(dirty, "doc_id", "left_anti").join(
        eval_df.select("doc_id"), "doc_id", "left_anti"  # never train on eval
    )
    stats["after_decontaminate"] = clean.count()

    # 6. the eval-side report: benchmark items whose shingles leak
    #    from the surviving train corpus get DROPPED FROM EVAL (the
    #    train side of this report is map-only — see
    #    eval_contamination_report's scale note)
    eval_leaks = D.eval_contamination_report(clean, eval_df).filter(
        F.col("contamination") > max_contamination
    )
    stats["eval_items_to_drop"] = eval_leaks.count()

    # 7. token-budgeted downsample: keep each doc with probability
    #    proportional to its length (first-order pps), deterministic
    #    under retries/AQE via the hash coin — production would use
    #    xxhash64; target_docs sets the expected survivor count
    target_docs = max(stats["after_decontaminate"] // 2, 1)
    total = clean.agg(F.sum("n_chars").cast("bigint").alias("_w")).first()["_w"]
    sampled = clean.filter(
        xxhash_bucket("doc_id", 1_000_000)
        < F.least(
            F.lit(1_000_000).cast("bigint"),
            F.expr(f"CAST((n_chars * {target_docs} * 1000000) DIV {total} AS BIGINT)"),
        )
    )
    stats["after_pps_sample"] = sampled.count()

    # 8. deterministic split — the hasher choice is pinned for the
    #    life of the dataset (hash_split docstring)
    split = hash_split(sampled, "doc_id", hasher=xxhash_bucket)
    stats["split_sizes"] = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 9. pack the train split into fixed-budget chunks
    train = split.filter(F.col("split") == "train")
    packed = pack_chunks(
        train.select("doc_id", "n_tokens"),
        order_col="doc_id",
        tokens_col="n_tokens",
        budget=chunk_budget,
    )
    # pack_chunks emits each doc's (start_chunk, end_chunk) range;
    # the number of packed chunks is the highest end + 1
    stats["train_chunks"] = packed.agg(
        (F.max("end_chunk") + 1).alias("n")
    ).first()["n"]
    return split, packed, stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    _split, _packed, stats = curate(spark, sf_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
