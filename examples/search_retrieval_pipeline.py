"""End-to-end search/retrieval pipeline — the serving stack a
document-search deployment composes from this engine, in the order a
retrieval engineer builds it:

  1. keyword leg: Okapi BM25 top-K for the query terms
     (doc_bm25_topk's machinery — broadcast stats, TakeOrdered)
  2. semantic leg: brute-force cosine top-K for the probe embedding
     (the exact baseline every ANN variant is audited against)
  3. fusion: reciprocal rank fusion of the two legs — rank-only, so
     the incomparable score scales never need normalizing
  4. ANN audit: recall of the hyperplane-LSH ANN path against the
     exact leg — the go/no-go evidence for switching leg 2 to ANN
  5. prefix audit: Matryoshka 16-of-64-dim recall — the evidence
     for (here, against) prefix-serving the embedding fleet
  6. keyphrase surfacing: RAKE keyphrases over the fused result
     set's documents — the "why did this match" display layer

Every stage is certified piecewise by driver-oracle rows
(doc_bm25_topk, emb_cosine_topk, doc_hybrid_rrf, emb_ann_recall,
emb_matryoshka_recall, doc_rake_keyphrases); this module is the
composition, smoke-tested in tests/test_examples.py.

Run:  python examples/search_retrieval_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the per-stage summary).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_retrieval_stack(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_bm25_topk,
        q_doc_rake_keyphrases,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_doc_hybrid_rrf,
        q_emb_ann_recall,
        q_emb_cosine_topk,
        q_emb_matryoshka_recall,
    )

    stats: dict = {}

    # 1. keyword leg
    kw = q_doc_bm25_topk(spark, sf_dir).collect()
    stats["bm25_pool"] = len(kw)
    stats["bm25_top_doc"] = kw[0]["doc_id"] if kw else None

    # 2. semantic leg (exact baseline)
    sem = q_emb_cosine_topk(spark, sf_dir)
    stats["cosine_pairs"] = sem.count()

    # 3. fusion
    fused = q_doc_hybrid_rrf(spark, sf_dir).collect()
    stats["fused_topk"] = len(fused)
    stats["fused_top_doc"] = fused[0]["doc_id"] if fused else None

    # 4. ANN audit — may the semantic leg switch to LSH?
    ann = q_emb_ann_recall(spark, sf_dir).collect()[0]
    stats["ann_recall_pass"] = bool(ann["recall_pass"])

    # 5. prefix audit — may the fleet serve 16 of 64 dims?
    mrl = q_emb_matryoshka_recall(spark, sf_dir).collect()[0]
    stats["matryoshka_recall_ppm"] = int(mrl["recall_ppm"])
    stats["prefix_serving_ok"] = mrl["recall_ppm"] >= 800_000

    # 6. why-it-matched keyphrases for the fused results
    fused_ids = [r["doc_id"] for r in fused]
    phrases = q_doc_rake_keyphrases(spark, sf_dir).collect()
    stats["keyphrases"] = [r["phrase"] for r in phrases[:3]]
    stats["fused_ids"] = fused_ids

    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    spark = get_spark("search-retrieval-pipeline", shuffle_partitions=8)
    stats = run_retrieval_stack(spark, sf_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
