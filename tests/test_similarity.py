"""Similarity search: exact brute-force correctness on planted
vectors; LSH recall against the exact baseline on real embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
    brute_force_topk,
    cosine,
    cosine_neardup_pairs,
    ivf_topk,
    random_hyperplane_lsh_topk,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])], ["a", "b"]
    )
    out = [r["c"] for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 9).alias("c")).collect()]
    assert out[0] == 0.0
    assert out[1] == 1.0


def test_brute_force_finds_planted_neighbor(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # nearest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    out = brute_force_topk(df, q, k=2).collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["rnk"] == 1
    assert out[0]["cosine_sim"] > 0.99


def test_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = random_hyperplane_lsh_topk(emb, queries, dim=64, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # defaults (6 planes, 12 tables, Hamming-1 multi-probe) must hold
    # the advertised recall contract even on these weakly-clustered
    # synthetic embeddings — the same bound emb_ann_recall gates on.
    assert recall >= 0.8, f"recall {recall}"


def test_lsh_multiprobe_beats_single_probe(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, queries, k=5).collect()}

    def recall(**kw):
        got = {(r["query_id"], r["neighbor_id"])
               for r in random_hyperplane_lsh_topk(emb, queries, dim=64, k=5, **kw).collect()}
        return len(exact & got) / len(exact)

    # Hamming-1 probing must strictly improve recall at equal tables
    assert recall(n_tables=8, probe_hamming=1) > recall(n_tables=8, probe_hamming=0)


def test_cosine_neardup_finds_planted_pair(spark):
    rows = [
        (0, "x", [1.0, 0.0, 0.0]),
        (1, "x", [0.999, 0.04, 0.0]),   # near-dup of 0, same block
        (2, "x", [0.0, 1.0, 0.0]),      # orthogonal, same block
        (3, "y", [1.0, 0.0, 0.0]),      # identical to 0 but other block
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = {(r["id_a"], r["id_b"]): r["cosine_sim"]
           for r in cosine_neardup_pairs(df, threshold=0.9).collect()}
    assert (0, 1) in out and out[(0, 1)] > 0.99
    assert (0, 2) not in out            # below threshold
    assert (0, 3) not in out            # blocked apart

def test_ivf_topk_recall_and_exactness(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
              for r in ivf_topk(emb, queries, k=5, nprobe=2).collect()}
    # probing 2 of 10 inverted lists must find a decent share of the
    # true top-5, and scores must be exact for every shared pair
    shared = set(exact) & set(approx)
    assert len(shared) / len(exact) >= 0.3
    assert all(exact[p] == approx[p] for p in shared)
    # every query returns exactly k candidates (lists are big enough)
    assert len(approx) == 10 * 5

def test_lsh_scores_match_exact_for_shared_pairs(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
              for r in random_hyperplane_lsh_topk(emb, queries, dim=64, k=5).collect()}
    shared = set(exact) & set(approx)
    assert all(exact[p] == approx[p] for p in shared)
