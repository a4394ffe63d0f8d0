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


def test_scalar_quantize_exact_roundtrip(spark):
    """Codes and MSE against hand-computed values; a constant
    dimension must code to 0 with zero error instead of dividing by
    zero."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        scalar_quantize,
        scalar_quantize_stats,
    )

    rows = [
        (0, [0.0, 5.0, 1.0]),
        (1, [1.0, 5.0, 3.0]),
        (2, [2.0, 5.0, 2.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    stats = scalar_quantize_stats(emb)
    s = stats.collect()[0]
    assert s["los"] == [0.0, 5.0, 1.0] and s["his"] == [2.0, 5.0, 3.0]
    out = {r["vec_id"]: r for r in scalar_quantize(emb, stats, dim=3).collect()}
    # vec 0: codes (0, 0, 0)   vec 1: (round(127.5)=128, 0, 255)
    # vec 2: (255, 0, round(127.5)=128)
    assert out[0]["code_sum"] == 0 and out[0]["mse"] == 0.0
    assert out[1]["code_sum"] == 128 + 0 + 255
    assert out[2]["code_sum"] == 255 + 0 + 128
    # vec 1 dim 0 recon: 128/255*2 = 1.00392...; err^2/3 rounded to 9dp
    exp = round((1.0 - 128 / 255.0 * 2.0) ** 2 / 3, 9)
    assert out[1]["mse"] == exp


def test_kmeans_iterate_semantics(spark):
    """Two well-separated blobs with seeds inside each: one Lloyd
    round must assign every point to its blob's seed and pull the
    centroid to the blob mean; ties break to the lowest cid."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        kmeans_assign,
        kmeans_iterate,
        kmeans_update,
    )

    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]),
            (2, [1.0, 0.0]), (3, [0.0, 1.0]),
            (4, [11.0, 10.0]), (5, [10.0, 11.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["cid"]: r for r in kmeans_iterate(emb, k=2, dim=2, iters=1).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_members"] == 3 and out[1]["n_members"] == 3
    # cluster 0 mean = (1/3, 1/3); cluster 1 mean = (31/3, 31/3)
    import math
    assert out[0]["centroid_norm"] == round(math.sqrt(2 * (1 / 3) ** 2), 6)
    assert out[1]["centroid_norm"] == round(math.sqrt(2 * (31 / 3) ** 2), 6)

    # tie-break: a point equidistant from both seeds goes to cid 0
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0])], ["cid", "c"]
    )
    tied = spark.createDataFrame([(9, [1.0, 0.0])], ["vec_id", "embedding"])
    assert kmeans_assign(tied, cents, dim=2).collect()[0]["cid"] == 0

    # update means are exact
    assigned = spark.createDataFrame(
        [(0, [1.0, 3.0], 7), (1, [2.0, 5.0], 7)], ["vec_id", "embedding", "cid"]
    )
    c = kmeans_update(assigned).collect()[0]
    assert c["cid"] == 7 and c["c"] == [1.5, 4.0]


def test_kmeans_sparse_ids_and_convergence(spark):
    """Seeds are the k lowest ids PRESENT (orderBy+limit), so sparse
    or offset id spaces still yield exactly k seeds; ``tol`` stops
    iteration once the max centroid shift is within tolerance, giving
    the same audit as the exactly-converged run."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        kmeans_iterate,
    )

    rows = [(100, [0.0, 0.0]), (205, [10.0, 10.0]),
            (310, [1.0, 0.0]), (415, [0.0, 1.0]),
            (520, [11.0, 10.0]), (625, [10.0, 11.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["cid"]: r for r in kmeans_iterate(emb, k=2, dim=2, iters=2).collect()}
    # seeded from the two lowest PRESENT ids — an `id < k` filter
    # would have found zero seeds here
    assert set(out) == {100, 205}
    assert out[100]["n_members"] == 3 and out[205]["n_members"] == 3

    # the blobs converge after one update, so a tol'd run capped at 10
    # rounds stops early and matches the exact 2-round audit
    exact = sorted(map(tuple, kmeans_iterate(emb, k=2, dim=2, iters=2).collect()))
    tolled = sorted(map(tuple, kmeans_iterate(emb, k=2, dim=2, iters=10, tol=1e-9).collect()))
    assert exact == tolled


def test_pq_train_encode_adc_semantics(spark):
    """Hand-checkable PQ: dim=4, m=2 subspaces, k=2 codewords.  Two
    blobs per subspace -> codewords converge to the blob means in one
    round; codes, reconstruction MSE, and ADC distances follow in
    closed form."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [10.0, 10.0, 0.0, 0.0]),
        (2, [0.2, 0.0, 10.0, 10.2]),
        (3, [10.2, 10.0, 0.0, 0.2]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = pq_train(emb, m=2, k=2, dim=4, iters=1)
    books = {(r["sub"], r["cid"]): r["c"] for r in cents.collect()}
    # sub 0: blob means (0.1, 0) and (10.1, 10); sub 1: (10, 10.1), (0, 0.1)
    assert books[(0, 0)] == [0.1, 0.0] and books[(0, 1)] == [10.1, 10.0]
    assert books[(1, 0)] == [10.0, 10.1] and books[(1, 1)] == [0.0, 0.1]

    enc = {r["vec_id"]: r for r in pq_encode(emb, cents, m=2, dim=4).collect()}
    assert enc[0]["codes"] == [0, 0] and enc[1]["codes"] == [1, 1]
    assert enc[2]["codes"] == [0, 0] and enc[3]["codes"] == [1, 1]
    # vec 0 reconstruction: err (0.1^2 + 0 + 0 + 0.1^2) / 4
    assert abs(enc[0]["mse"] - 0.02 / 4) < 1e-12

    queries = emb.filter(F.col("vec_id") == 0)
    top = pq_adc_topk(emb, queries, cents, m=2, dim=4, k=2).collect()
    assert [(r["neighbor_id"], r["rnk"]) for r in top] == [(2, 1), (1, 2)]
    # neighbor 2 shares vec 0's codes: dist = sum of per-sub recon errs
    assert top[0]["approx_dist"] == 0.02
    # neighbor 1: sub0 (0-10.1)^2+(0-10)^2 + sub1 (10-0)^2+(10-0.1)^2
    assert top[1]["approx_dist"] == round(202.01 + 198.01, 6)


def test_pq_quality_audit_on_real_embeddings(spark):
    """PQ quality contracts on the real embedding table: (a) finer
    quantization (more subspaces at fixed k) strictly reduces mean
    reconstruction MSE — the audit a pipeline reads to pick m; (b)
    ADC top-5 recall vs the exact L2 top-5 is far above the ~0.01
    random baseline even at 12 bits/vector (these synthetics are
    weakly clustered — real embedding spaces quantize much better)."""
    from pyspark.sql import Window

    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            S._sqdist(F.col("qv"), F.col("cv")).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc()
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }

    mses = []
    for m in [2, 4, 8]:
        cents = S.pq_train(emb, m=m, k=8, dim=64, iters=2)
        mses.append(
            S.pq_encode(emb, cents, m=m, dim=64)
            .agg(F.avg("mse"))
            .collect()[0][0]
        )
        if m == 4:
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in S.pq_adc_topk(
                    emb, queries, cents, m=m, dim=64, k=5
                ).collect()
            }
    assert mses[0] > mses[1] > mses[2], mses
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.1, f"recall {recall}"


def test_kmeans_assign_batch_matches_fold(spark):
    """The GEMM batch assignment (production path) must agree with
    the oracle-certified interpreted fold on every vector of the real
    embedding table — near-tie flips are theoretically possible but
    must not occur on actual data — and must honor the lowest-cid
    tie rule on an exact tie."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        kmeans_assign,
        kmeans_assign_batch,
        pq_train,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    # trained (non-degenerate) centroids: 2 Lloyd rounds, k=8 over the
    # full vector (pq_train with m=1 IS plain k-means on id-rank seeds)
    cents = pq_train(emb, m=1, k=8, dim=64, iters=2).select("cid", "c")
    fold = {r["vec_id"]: r["cid"] for r in kmeans_assign(emb, cents, dim=64).collect()}
    gemm = {r["vec_id"]: r["cid"] for r in kmeans_assign_batch(emb, cents).collect()}
    assert fold == gemm

    # exact tie -> lowest cid, same as the fold
    cents2 = spark.createDataFrame([(0, [0.0, 0.0]), (1, [2.0, 0.0])], ["cid", "c"])
    tied = spark.createDataFrame([(9, [1.0, 0.0])], ["vec_id", "embedding"])
    assert kmeans_assign_batch(tied, cents2).collect()[0]["cid"] == 0


def test_ivf_adc_composition(spark):
    """IVFADC contracts: probing ALL lists makes it exactly
    pq_adc_topk (pruning is the only difference), and with pruning
    every returned neighbor belongs to one of the query's nprobe
    nearest-by-L2 label centroids."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        ivf_adc_topk,
        label_centroids,
        pq_adc_topk,
        pq_train,
        _sqdist,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = pq_train(emb, m=4, k=8, dim=64, iters=2)
    n_labels = emb.select("label").distinct().count()

    full = sorted(
        map(tuple, pq_adc_topk(emb, queries, cents, m=4, dim=64, k=5).collect())
    )
    all_probe = sorted(
        map(
            tuple,
            ivf_adc_topk(
                emb, queries, cents, m=4, dim=64, k=5, nprobe=n_labels
            ).collect(),
        )
    )
    assert full == all_probe

    pruned = ivf_adc_topk(emb, queries, cents, m=4, dim=64, k=5, nprobe=2)
    got = pruned.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2, 3, 4}
    # every neighbor's label must be one of its query's 2 nearest lists
    civf = label_centroids(emb)
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    d = _sqdist(F.col("qv"), F.col("centroid"))
    ranked = q.crossJoin(civf).select("qid", "label", d.alias("d")).collect()
    import collections
    by_q = collections.defaultdict(list)
    for r in ranked:
        by_q[r["qid"]].append((r["d"], r["label"]))
    allowed = {qid: {l for _, l in sorted(v)[:2]} for qid, v in by_q.items()}
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in got:
        assert labels[r["neighbor_id"]] in allowed[r["query_id"]]


def test_kmeans_tol_cluster_death_not_converged(spark, monkeypatch):
    """A cluster that loses every member must count as an INFINITE
    centroid shift on the tol path (full outer join on cid — r5
    advice): with two identical seeds cluster 1 dies in round 1, and
    an inner-join shift metric would silently drop it and declare
    convergence under any tol.  The fixed path must keep iterating."""
    import crypto_price_tracker_with_etl_dashboard_spark.functions.similarity as S

    calls: list[int] = []
    real_assign = S.kmeans_assign

    def counting(*a, **kw):
        calls.append(1)
        return real_assign(*a, **kw)

    monkeypatch.setattr(S, "kmeans_assign", counting)
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 1.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.kmeans_iterate(emb, k=2, dim=2, iters=3, tol=1e9).collect()
    # round 1 kills cluster 1 -> inf shift -> NO early stop (the old
    # inner join would have stopped here with 1 call); round 2 has the
    # surviving cluster stable on both sides -> genuine convergence
    assert len(calls) == 2
    assert {r["cid"] for r in out} == {0}
    assert out[0]["n_members"] == 4


def test_adc_dist_missing_code_surfaces_null(spark):
    """A code matching no LUT entry (stale/mismatched codebook) must
    yield a NULL distance, not silently contribute 0.0 (r5 advice)."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        _adc_dist,
    )

    lut = (
        "array(struct(CAST(0 AS BIGINT) AS cid, CAST(1.5 AS DOUBLE) AS d),"
        " struct(CAST(2 AS BIGINT) AS cid, CAST(9.0 AS DOUBLE) AS d))"
    )
    ok = spark.sql(f"SELECT {lut} AS _lut0, array(CAST(2 AS BIGINT)) AS codes")
    assert ok.select(_adc_dist(1).alias("d")).collect()[0]["d"] == 9.0
    stale = spark.sql(f"SELECT {lut} AS _lut0, array(CAST(7 AS BIGINT)) AS codes")
    assert stale.select(_adc_dist(1).alias("d")).collect()[0]["d"] is None


def test_gemm_udfs_handle_zero_row_batch():
    """Arrow can hand a pandas UDF a zero-row batch; the GEMM kernels
    must return an empty series instead of raising on a shape-(0,)
    matmul (r5 advice)."""
    import numpy as np
    import pandas as pd

    from crypto_price_tracker_with_etl_dashboard_spark.functions._kmeans_udf import (
        kmeans_assign_udf,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.functions._lsh_udf import (
        lsh_buckets_udf,
    )

    assign = kmeans_assign_udf(np.zeros((2, 4)), np.array([0, 1]))
    out = assign.func(pd.Series([], dtype="object"))
    assert len(out) == 0 and out.dtype == "int64"
    buckets = lsh_buckets_udf(np.zeros((4, 6)), 3, 2)
    assert len(buckets.func(pd.Series([], dtype="object"))) == 0


def test_pq_encode_batch_matches_fold(spark):
    """The GEMM batch PQ encoder (production path) must produce the
    identical codes as the oracle-certified interpreted fold on every
    vector of the real embedding table, and must honor the lowest-cid
    tie rule on an exact subspace tie."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        pq_encode,
        pq_encode_batch,
        pq_train,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = pq_train(emb, m=4, k=8, dim=64, iters=2)
    fold = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cents, m=4, dim=64).collect()}
    gemm = {r["vec_id"]: r["codes"] for r in pq_encode_batch(emb, cents, m=4, dim=64).collect()}
    assert fold == gemm

    # exact per-subspace tie -> lowest cid, same as the fold
    cents2 = spark.createDataFrame(
        [(0, 0, [0.0]), (0, 1, [2.0]), (1, 0, [5.0]), (1, 1, [3.0])],
        ["sub", "cid", "c"],
    )
    tied = spark.createDataFrame([(9, [1.0, 4.0])], ["vec_id", "embedding"])
    assert pq_encode_batch(tied, cents2, m=2, dim=2).collect()[0]["codes"] == [0, 0]


def test_semdedup_drops_higher_id_near_dups(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        semdedup,
    )

    # two obvious clusters on the x/y axes; ids 0,1,2 are near-dups of
    # each other in cluster 0 -> keep 0, drop 1 and 2; cluster 1 has
    # one near-dup pair (10, 11) -> drop 11; 12 is dissimilar enough
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.998, 0.02]),
        (10, [0.0, 1.0]),
        (11, [0.01, 0.999]),
        (12, [0.7, 0.72]),  # assigned to y-cluster, low cosine to 10/11
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "c"]
    )
    out = {
        r["cid"]: (r["n_members"], r["n_dropped"], r["n_kept"])
        for r in semdedup(emb, cents, dim=2, threshold=0.99).collect()
    }
    assert out == {0: (3, 2, 1), 1: (3, 1, 2)}


def test_semdedup_no_cross_cluster_pairs(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        semdedup,
    )

    # 45-degree twins land in DIFFERENT clusters (tie -> lowest cid
    # for the first, the second nudged to cluster 1): cosine between
    # them is ~1 but they must NOT dedup across the cluster boundary
    rows = [(0, [1.0, 1.0]), (1, [0.99, 1.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(0, [1.0, 0.9999]), (1, [0.99, 1.0])], ["cid", "c"]
    )
    out = {r["cid"]: r["n_dropped"] for r in
           semdedup(emb, cents, dim=2, threshold=0.5).collect()}
    assert out == {0: 0, 1: 0}


def test_knn_classify_majority_and_tie_rule(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        knn_classify,
    )

    # query near the x-axis: 3 label-7 neighbors closer than 2
    # label-3 ones -> majority 7.  k=5 exactly covers them.
    corpus_rows = [
        (1, [1.0, 0.0], 7),
        (2, [0.99, 0.01], 7),
        (3, [0.98, 0.02], 7),
        (4, [0.7, 0.7], 3),
        (5, [0.6, 0.8], 3),
        (6, [0.0, 1.0], 9),  # far — outside top-5? no: 6 rows, k=5 keeps it out only if farther
    ]
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding", "label"])
    queries = spark.createDataFrame([(100, [1.0, 0.05])], ["vec_id", "embedding"])
    out = knn_classify(corpus, queries, k=5).collect()
    assert len(out) == 1
    assert out[0]["predicted_label"] == 7 and out[0]["n_votes"] == 3

    # vote tie (two label-7 and two label-3 symmetric around the
    # 45-degree query) -> tie on votes breaks to the LOWEST label
    import math

    def ang(deg, vid, label):
        r = math.radians(deg)
        return (vid, [math.cos(r), math.sin(r)], label)

    sym = spark.createDataFrame(
        [ang(10, 1, 7), ang(20, 2, 7), ang(70, 3, 3), ang(80, 4, 3)],
        ["vec_id", "embedding", "label"],
    )
    queries2 = spark.createDataFrame([(101, [1.0, 1.0])], ["vec_id", "embedding"])
    out2 = knn_classify(sym, queries2, k=4).collect()[0]
    assert out2["n_votes"] == 2
    assert out2["predicted_label"] == 3  # tie on votes -> lowest label


def test_rp_project_impls_identical_and_signed(spark):
    """The hof and codegen impls produce bit-identical fixed-point
    projections; a one-hot input recovers the sign column itself."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        rp_project,
        rp_signs,
    )

    rows = [
        (1, [0.5] * 8),
        (2, [(-1) ** d * 0.125 * d for d in range(8)]),
        (3, [1.0] + [0.0] * 7),  # one-hot: rp_j = sign(j, 0) * scale
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = {
        r["vec_id"]: tuple(r[f"rp{j}"] for j in range(4))
        for r in rp_project(df, dim=8, out_dim=4, impl="hof").collect()
    }
    b = {
        r["vec_id"]: tuple(r[f"rp{j}"] for j in range(4))
        for r in rp_project(df, dim=8, out_dim=4, impl="codegen").collect()
    }
    assert a == b
    assert a[3] == tuple(rp_signs(j, 0) * 10_000 for j in range(4))


def test_rp_project_rejects_bad_args(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        rp_project,
    )

    df = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out_dim"):
        rp_project(df, dim=0, out_dim=4)
    with _pytest.raises(ValueError, match="impl"):
        rp_project(df, dim=1, out_dim=1, impl="gpu")


# ---- farthest-point sampling ------------------------------------------------

def test_kcenter_picks_spread_not_cluster(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        kcenter_sample,
    )

    # three tight clusters at (0,0), (10,0), (0,10); k=3 must pick
    # one point from EACH cluster (greedy 2-approx covers all)
    pts = (
        [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
        + [(10 + i, [10.0 + i * 0.01, 0.0]) for i in range(5)]
        + [(20 + i, [0.0, 10.0 + i * 0.01]) for i in range(5)]
    )
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = kcenter_sample(df, k=3).collect()
    clusters = {r["vec_id"] // 10 for r in out}
    assert clusters == {0, 1, 2}
    assert [r["sel_order"] for r in out] == [1, 2, 3]
    assert out[0]["sel_dist2"] is None and out[1]["sel_dist2"] > 90


def test_kcenter_seed_is_min_id_and_ties_to_smaller(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
        kcenter_sample,
    )

    # two coincident far points (7, 9): the farthest tie breaks to 7
    pts = [(3, [0.0, 0.0]), (7, [5.0, 5.0]), (9, [5.0, 5.0])]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = kcenter_sample(df, k=2).collect()
    assert out[0]["vec_id"] == 3  # min id seed
    assert out[1]["vec_id"] == 7  # tie -> smaller id


def test_maxsim_gemm_twin_matches_fold_exactly(spark):
    """The Arrow GEMM batch scorer (functions/_kmeans_udf.py::
    maxsim_cos_ppm_udf) must reproduce the certified interpreted
    fold's ppm-quantized cosines bit-for-bit on the real embedding
    table — the production-path equivalence discipline
    (kmeans_assign_batch, pq_codes) applied to MaxSim."""
    import numpy as np

    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.functions._kmeans_udf import (
        maxsim_cos_ppm_udf,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    tok_rows = (
        emb.filter(F.col("vec_id") < 8).orderBy("vec_id")
        .select("vec_id", "embedding").collect()
    )
    tokens = np.array([list(r["embedding"]) for r in tok_rows])
    corpus = emb.filter(F.col("vec_id") >= 8)

    # fold side: the certified query's per-pair quantization
    fold = corpus.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(r["vec_id"], list(map(float, r["embedding"]))) for r in tok_rows],
                "token_id bigint, tok_vec array<double>",
            )
        )
    ).select(
        "vec_id", "token_id",
        F.round(
            F.round(S.cosine(F.col("tok_vec"), F.col("embedding")), 6) * 1000000.0
        ).cast("bigint").alias("ppm"),
    )
    fold_map = {(r["vec_id"], r["token_id"]): r["ppm"] for r in fold.collect()}

    gemm = corpus.select(
        "vec_id", maxsim_cos_ppm_udf(tokens)(F.col("embedding")).alias("ppms")
    )
    mismatches = 0
    for r in gemm.collect():
        for t, ppm in enumerate(r["ppms"]):
            if fold_map[(r["vec_id"], tok_rows[t]["vec_id"])] != ppm:
                mismatches += 1
    assert mismatches == 0
