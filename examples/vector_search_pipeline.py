"""End-to-end vector-search pipeline — a worked composition of the
engine's embedding operators, in the order a billion-vector
deployment (the FAISS IVFADC+refine layout) builds and serves an
index:

  1. index build: k-means coarse quantizer (Lloyd rounds via
     kmeans_assign/kmeans_update — GEOMETRIC inverted lists, which
     roughly doubles probe recall over class-label lists on this
     corpus) + product-quantization codebooks + corpus encode
     (functions/similarity.py — corpus floats touched once)
  2. serve: IVFADC shortlist (coarse probe restricts ADC scoring to
     nprobe inverted lists), then EXACT re-rank of the shortlist on
     the original vectors — the standard refine step: quantization
     error decides the shortlist, never the final order
  3. audit: recall@k against exact squared-L2 top-k — the SAME
     metric ADC approximates (auditing against cosine would
     conflate metric choice with quantization loss)
  4. curate: contrastive hard negatives for the labeled corpus
     (metric-learning batch mining from the same embeddings)
  5. layout: JL random projection to 8 dims — the cheap coordinates
     downstream clustering / visualization runs on

Run:  python examples/vector_search_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the per-stage summary).

Each stage is certified piecewise by driver-oracle rows
(emb_kmeans, emb_pq_quantize, emb_ivfadc_topk, emb_ann_recall,
emb_hard_negatives, emb_rp_project); this module is the
composition, smoke-tested in tests/test_examples.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions import similarity as S
from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

DIM = 64
PQ_M = 8  # subspaces
PQ_K = 16  # codewords per subspace
N_LISTS = 10  # coarse clusters
LLOYD_ROUNDS = 3


def _exact_l2_topk(emb, queries, *, k: int):
    """Exact squared-L2 top-k (the ADC metric): queries broadcast,
    corpus scanned once — the brute_force_topk plan with the distance
    swapped (||q-c||^2 = q.q - 2 q.c + c.c from precomputed self-dots)."""
    from pyspark.sql import Window

    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        _dot,
    )

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _dot(F.col("embedding"), F.col("embedding")).alias("qq"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _dot(F.col("embedding"), F.col("embedding")).alias("cc"),
    )
    d2 = F.round(
        F.col("qq") - 2 * _dot(F.col("qv"), F.col("cv")) + F.col("cc"), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _kmeans_quantizer(emb, *, k: int, rounds: int):
    """Lloyd loop from the k lowest-id seeds: returns
    (centroids(cid, c), corpus assigned with a cid column)."""
    from pyspark.sql import Window

    seeds = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("embedding").alias("c"),
        )
    )
    cents = seeds
    # GEMM batch kernel on every assignment pass — the production
    # path at corpus scale (driver-certified primary path of
    # emb_kmeans_gemm: bit-identical to the interpreted fold,
    # measured x1.3 at 10x data where the fold-trained variant is
    # x4.2 — BASELINE.md batch 61)
    for _ in range(rounds):
        assigned = S.kmeans_assign_batch(emb, cents)
        cents = S.kmeans_update(assigned).localCheckpoint(eager=True)
    assigned = S.kmeans_assign_batch(emb, cents).select(
        "vec_id", "embedding", "cid"
    )
    return cents, assigned


def build_and_search(
    spark,
    sf_dir: str,
    *,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 20,
    n_queries: int = 5,
):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries)

    # 1. index build: geometric coarse lists + PQ codebooks
    cents, assigned = _kmeans_quantizer(emb, k=N_LISTS, rounds=LLOYD_ROUNDS)
    ivf_cents = cents.select("cid", F.col("c").alias("centroid"))
    books = S.pq_train(emb, m=PQ_M, k=PQ_K, dim=DIM)

    # 2. serve: ADC shortlist over the probed lists, exact re-rank
    q = assigned.filter(F.col("vec_id") < n_queries)
    shortlisted = S.ivf_adc_topk(
        assigned, q, books, m=PQ_M, dim=DIM, k=shortlist, nprobe=nprobe,
        label_col="cid", centroids=ivf_cents,
    )
    reranked = _rerank_exact(emb, queries, shortlisted, k=k)

    # 3. recall audit vs exact search UNDER THE SAME METRIC — ADC
    # approximates squared L2, so the ground truth is exact-L2 top-k
    # (auditing against cosine would conflate metric choice with
    # quantization loss and report near-zero recall)
    exact = _exact_l2_topk(emb, queries, k=k)
    hits = (
        reranked.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    expected = exact.count()
    recall = hits / expected if expected else 0.0

    # 4. contrastive hard negatives (top-k nearest different-label)
    negatives = S.hard_negative_topk(emb, queries, k=k)

    # 5. cheap 8-dim coordinates for downstream clustering
    projected = S.rp_project(emb, dim=DIM, out_dim=8)

    stats = {
        "corpus": emb.count(),
        "queries": queries.count(),
        "shortlist_pairs": shortlisted.count(),
        "final_pairs": reranked.count(),
        "recall_at_k": recall,
        "hard_negatives": negatives.count(),
        "projected_rows": projected.count(),
    }
    return reranked, negatives, projected, stats


def _rerank_exact(emb, queries, shortlisted, *, k: int):
    """The refine step: exact squared-L2 over ONLY the shortlist
    pairs (|queries| x shortlist rows — broadcast-sized), so the
    final ranking carries no quantization error."""
    from pyspark.sql import Window

    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        _dot,
    )

    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    pairs = (
        shortlisted.select("query_id", "neighbor_id")
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
    )
    d2 = F.round(
        _dot(F.col("qv"), F.col("qv"))
        - 2 * _dot(F.col("qv"), F.col("cv"))
        + _dot(F.col("cv"), F.col("cv")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector-search-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    _, _, _, stats = build_and_search(spark, sf_dir)
    for key, val in stats.items():
        print(f"{key:>16}: {val}")


if __name__ == "__main__":
    main()
