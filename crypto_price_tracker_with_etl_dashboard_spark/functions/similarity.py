"""Similarity search over embedding columns (array<float>).

- ``cosine``: JVM-side higher-order-function dot product (zip_with +
  sequential aggregate fold in double precision — same fold order as
  the oracle's list_sum, so results are bit-reproducible).
- ``brute_force_topk``: exact top-k neighbors for a (small) query
  set: broadcast the queries, one map stage over the corpus, rank
  window per query.  This is the correctness baseline; it scales as
  O(|corpus| x |queries|) with NO shuffle of the corpus (queries are
  broadcast), so it is actually the right plan at 100 TB whenever the
  query set is broadcast-sized.
- ``random_hyperplane_lsh_topk``: the scale path for large query
  sets — sign-bit bucketing with deterministic hyperplanes derived
  from md5 (portable, seedless); candidates only within matching
  buckets, then exact re-rank.  Recall is tested against the brute
  force in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return (_dot(a, b) / (_norm(a) * _norm(b))).cast("double")


def _pair_cosine(qv: Column, cv: Column, qn: Column, cn: Column) -> Column:
    """Cosine from PRE-COMPUTED norms: dot/(qn*cn) — identical float
    grouping to ``cosine`` (dot/(norm*norm)), so results are
    bit-equal, but the O(pairs) stage folds one array pass instead of
    three (norms are O(rows), computed once per side)."""
    return (_dot(qv, cv) / (qn * cn)).cast("double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for every query row, the k nearest corpus
    rows (excluding itself).  Ties broken by neighbor id ascending."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    ).select("neighbor_id", "vec", _norm(F.col("vec")).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pair_cosine(F.col("query_vec"), F.col("vec"), F.col("qn"), F.col("cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs within a blocking
    group whose (6-dp rounded) cosine clears the threshold.  The
    blocking key bounds the quadratic stage; for unblocked corpora
    feed ``lsh_bucket`` output as the block column so candidates are
    LSH-bucketed instead (same shape, approximate recall).

    Norms are precomputed per row (O(n)) so the quadratic stage folds
    a single dot product per pair; the normed side is cached because
    it feeds both sides of the self-join."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    side = (
        fan_out(df.select(F.col(id_col), F.col(block_col), F.col(vec_col)))
        .withColumn("nrm", _norm(F.col(vec_col)))
        .cache()
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                _pair_cosine(
                    F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                    F.col("a.nrm"), F.col("b.nrm"),
                ),
                6,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def label_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid as array<double>: element-wise mean with
    exact decimal accumulation (order-independent, so identical on
    any engine / partitioning).  Output is tiny (|labels| rows) —
    always broadcast-sized."""
    per_dim = (
        corpus.select(F.col(label_col), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(
            (F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v"))
            .alias("mean_v")
        )
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_v"))),
            lambda s: s["mean_v"],
        ).alias("centroid")
    )


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF index build: materialize the coarse quantizer (per-label
    centroids) as a CACHED |labels|-row DataFrame.  A real IVF index
    (FAISS et al.) separates the expensive one-time build from the
    per-query probe; recomputing centroids inside every query — one
    posexplode + two shuffles over the whole corpus — is the wrong
    plan at 100 TB.  Build once per (corpus, quantizer) and hand the
    result to every ``ivf_topk`` call."""
    cents = label_centroids(corpus, id_col, vec_col, label_col).cache()
    cents.count()  # materialize eagerly: build cost paid here, not per query
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer = per-label
    centroids; each query probes its ``nprobe`` nearest centroids and
    re-ranks exactly within those inverted lists only.

    Scale shape: centroids are |labels| rows (broadcast); probe
    assignment is a narrow map over queries; the candidate stage is a
    broadcast join of (query, probe_label) pairs against the corpus
    partitioned by label — the corpus is scanned once, never
    shuffled, and only 1/|labels|*nprobe of it is scored per query.
    Fully deterministic (centroids use exact decimal means), so —
    unlike random-hyperplane LSH — the oracle can replicate it.

    Pass ``centroids`` (from :func:`ivf_build`) to reuse a built
    index; otherwise the centroid subplan is computed inline (one
    extra corpus pass per call)."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    cents = (
        centroids
        if centroids is not None
        else label_centroids(corpus, id_col, vec_col, label_col)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_sim").desc(), F.col(label_col).asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "query_vec",
            "qn",
            F.col(label_col),
            F.round(cosine(F.col("query_vec"), F.col("centroid")), 6).alias("cent_sim"),
        )
        .withColumn("probe_rnk", F.row_number().over(probe_w))
        .filter(F.col("probe_rnk") <= nprobe)
        .select("query_id", "query_vec", "qn", label_col)
    )
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"),
            F.col(label_col),
        )
    ).select("neighbor_id", "vec", label_col, _norm(F.col("vec")).alias("cn"))
    scored = (
        c.join(F.broadcast(probes), label_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pair_cosine(F.col("query_vec"), F.col("vec"), F.col("qn"), F.col("cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component d
    is derived from md5(plane:dim) mapped to [-1, 1).  Seedless and
    portable — any engine (or the oracle) can regenerate it."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane_idx}:{d}".encode()).hexdigest()[:8]
        comps.append((int(h, 16) / float(0xFFFFFFFF)) * 2.0 - 1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, table: int = 0) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes): bit p set iff
    dot(vec, plane_p) > 0.  ``table`` selects an independent plane
    family so multiple hash tables can be OR-combined."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, table * n_planes + p)])
        # 6dp-rounded sign: keeps this fold-order bucket function
        # bit-consistent with the GEMM UDF and the DuckDB oracle.
        out = out + F.when(
            F.round(_dot(vec, plane), 6) > 0, F.lit(2 ** p)
        ).otherwise(F.lit(0))
    return out


def _lsh_buckets_udf(dim: int, n_planes: int, n_tables: int):
    """Vectorized bucket computation: one Arrow-batched pandas UDF
    computing ALL n_tables*n_planes plane dots as a single numpy
    matmul per batch, returning the n_tables bucket ids per row.

    This is the documented exception to the no-UDF rule: the same
    math as ``lsh_bucket`` (identical md5-derived planes, float64),
    but a (batch x dim) @ (dim x planes) GEMM instead of
    n_tables*n_planes interpreted higher-order-function folds per
    row — ~20x faster, and the hot path at corpus scale.  The sign
    test uses the 6dp-ROUNDED dot, so summation order (numpy
    pairwise vs sequential fold) cannot flip a bucket bit — buckets
    are engine-portable and the DuckDB oracle regenerates them
    exactly.
    """
    import numpy as np

    from crypto_price_tracker_with_etl_dashboard_spark.functions._lsh_udf import lsh_buckets_udf

    planes = np.array(
        [
            _hyperplane(dim, t * n_planes + p)
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    ).T  # (dim, n_tables*n_planes)
    return lsh_buckets_udf(planes, n_planes, n_tables)


def _with_lsh_tables(
    df: DataFrame, vec_col: str, dim: int, n_planes: int, n_tables: int
) -> DataFrame:
    """Append (table_idx, bucket) rows for OR-amplified LSH: the
    bucket array is MATERIALIZED in one projection (single UDF eval
    per row) and then position-exploded — a corpus/query pair is a
    candidate iff the buckets match in ANY table.  More tables ->
    higher recall, linearly more candidates."""
    udf = _lsh_buckets_udf(dim, n_planes, n_tables)
    return df.withColumn("__bks", udf(F.col(vec_col))).select(
        "*", F.posexplode("__bks").alias("table_idx", "bucket")
    ).drop("__bks")


def random_hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 12,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to rows sharing the
    query's LSH bucket in at least one of ``n_tables`` hash tables
    (OR-amplification), then exact cosine re-rank.  The bucket
    equi-join replaces the cross join — at scale this shuffles each
    side once on a small (table, bucket) key instead of scoring
    |corpus| x |queries| pairs.

    ``probe_hamming=1`` enables multi-probe LSH (Lv et al., VLDB'07):
    each query additionally probes every bucket at Hamming distance 1
    from its own (flip one sign bit), on the QUERY side only — the
    corpus still stores one bucket per table, so corpus-side cost is
    unchanged and the probe fan-out multiplies only the broadcast-side
    rows by (1 + n_planes).  A plane whose dot is near zero is exactly
    the one most likely to mis-bucket a true neighbor, so Hamming-1
    probing recovers most of the recall lost to boundary vectors —
    fewer tables are needed for the same recall (memory for probes).

    Recall knobs: n_tables up -> recall up (linear candidate cost);
    n_planes up -> selectivity up, per-table recall down (scale
    n_planes ~ log2(corpus) to keep bucket sizes bounded);
    probe_hamming 0/1 trades query fan-out for tables.  Defaults hit
    recall@5 >= 0.9 on the weakly-clustered synthetic embeddings
    (hard case: true neighbors sit at cosine ~0.4, so per-plane
    collision is barely above 1/2) — strongly-clustered real
    embedding spaces need fewer tables.
    """
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    c = _with_lsh_tables(
        fan_out(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
            )
        ).select("neighbor_id", "vec", _norm(F.col("vec")).alias("cn")),
        "vec", dim, n_planes, n_tables,
    )
    q = _with_lsh_tables(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
            _norm(F.col(vec_col)).alias("qn"),
        ),
        "query_vec", dim, n_planes, n_tables,
    )
    if probe_hamming:
        # multi-probe: query-side bucket fan-out to Hamming-1 buckets
        offsets = [0] + [1 << p for p in range(n_planes)]
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(o)) for o in offsets])
            ),
        )
    scored = (
        c.join(F.broadcast(q), ["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair colliding in several tables must be scored once
        .select("query_id", "neighbor_id", "query_vec", "vec", "qn", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pair_cosine(F.col("query_vec"), F.col("vec"), F.col("qn"), F.col("cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def scalar_quantize_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension global [min, max] as one row of two
    position-ordered arrays — the codebook for scalar (int8-style)
    quantization.  One posexplode + tiny agg; output is O(dim),
    always broadcast-sized."""
    per_dim = (
        emb.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.min(F.col("v").cast("double")).alias("lo"),
            F.max(F.col("v").cast("double")).alias("hi"),
        )
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lo"))), lambda s: s["lo"]
        ).alias("los"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "hi"))), lambda s: s["hi"]
        ).alias("his"),
    )


def scalar_quantize(
    emb: DataFrame,
    stats: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar quantization audit: 8-bit code per dimension
    (round((v-lo)/(hi-lo)*255), 0 for constant dims) against the
    global per-dim codebook, emitting the exact integer code sum (a
    checksum certifying every code) and the reconstruction MSE.  The
    corpus is scanned once with the 1-row codebook broadcast — a
    zero-shuffle map at any scale; all arithmetic is the sequential
    double fold the DuckDB oracle reproduces bit-for-bit."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def at(arr: Column, i: Column) -> Column:
        return F.element_at(arr, i + 1)

    def code(i: Column) -> Column:
        v = at(F.col(vec_col), i).cast("double")
        lo, hi = at(F.col("los"), i), at(F.col("his"), i)
        return F.when(hi == lo, F.lit(0.0)).otherwise(
            F.round((v - lo) / (hi - lo) * 255, 0)
        )

    def sq_err(i: Column) -> Column:
        v = at(F.col(vec_col), i).cast("double")
        lo, hi = at(F.col("los"), i), at(F.col("his"), i)
        diff = v - (lo + code(i) / 255.0 * (hi - lo))
        return diff * diff

    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return emb.crossJoin(F.broadcast(stats)).select(
        id_col,
        fold(F.transform(idx, code)).cast("bigint").alias("code_sum"),
        F.round(fold(F.transform(idx, sq_err)) / dim, 9).alias("mse"),
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 between a float-typed and a double-typed array —
    the SAME sequential double fold everywhere (assignment, PQ
    encode, ADC scoring, and the oracle's list_sum), so distances
    are bit-reproducible across engines."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_codeword(sv: Column, book: Column) -> Column:
    """Fold over a cid-ordered array<struct<cid,c>> codebook keeping
    the running (best_d, best_cid): ties break to the lowest cid —
    identical semantics to the oracle's (d ASC, cid ASC) rank."""
    def step(acc: Column, s: Column) -> Column:
        d = _sqdist(sv, s["c"])
        better = d < acc["d"]
        return F.struct(
            F.when(better, d).otherwise(acc["d"]).alias("d"),
            F.when(better, s["cid"]).otherwise(acc["cid"]).alias("cid"),
        )

    return F.aggregate(
        book,
        F.struct(
            F.lit(float("inf")).alias("d"),
            F.lit(-1).cast("bigint").alias("cid"),
        ),
        step,
    )


def kmeans_assign(
    emb: DataFrame,
    cents: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd assignment step: nearest centroid by squared L2 (ties ->
    lowest cid), as a ZERO-SHUFFLE map: the k centroids are packed
    into one cid-ordered array row, broadcast, and each corpus row
    folds over them keeping the running (best_d, best_cid) — no
    explode, no per-vector window (a row_number argmin would shuffle
    |corpus| x k scored rows, the wrong plan at 100 TB).  The
    distance is the same sequential double fold the oracle's
    list_sum computes, so assignment is bit-deterministic across
    engines even though the oracle uses a rank formulation."""
    packed = cents.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("__cents")
    )
    best = _nearest_codeword(F.col(vec_col), F.col("__cents"))
    return (
        emb.crossJoin(F.broadcast(packed))
        .select(id_col, vec_col, best["cid"].alias("cid"))
    )


def kmeans_update(assigned: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Lloyd update step: decimal-exact per-dimension means per
    cluster (one shuffle on (cid, pos), partial-aggregated map-side),
    re-assembled into position-ordered centroid arrays.  Output is
    O(k) rows — always broadcast-sized."""
    per_dim = (
        assigned.select("cid", F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                / F.count("v")
            ).alias("mean_v")
        )
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_v"))),
            lambda s: s["mean_v"],
        ).alias("c")
    )


def kmeans_iterate(
    emb: DataFrame,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float | None = None,
) -> DataFrame:
    """K-means via ``iters`` Lloyd rounds from deterministic seeds —
    the k LOWEST ids actually present (orderBy + limit, so sparse or
    offset id spaces still yield exactly k seeds; an ``id < k``
    filter would silently under-seed them).  Returns per-cluster
    membership counts and the round-6 norm of the last UPDATED
    centroid — the audit a curation pipeline reads to pick k / detect
    collapse.  Every step is engine-portable arithmetic (broadcast
    assignment fold + decimal-exact means), so a SQL oracle can
    unroll the same rounds and match bit-for-bit.

    Lineage discipline: the O(k)-row centroid frame is
    ``localCheckpoint(eager=True)``-ed EVERY round — without it the
    assign->update chain re-derives all prior rounds each iteration
    (the exact lesson ``operators/components.py`` learned twice for
    CC labels/edges), so plan depth and job time grow quadratically
    in ``iters``.  Cost: one O(k)-row materialization per round —
    free at any corpus scale.  Plan-depth boundedness at ``iters>=8``
    is pinned in tests/test_plans.py.

    ``tol``: optional convergence stop — iteration halts once the
    max element-wise centroid shift is <= ``tol`` (an O(k)
    driver-side check per round, the moral twin of CC's
    changed-count stop).  Default None runs exactly ``iters`` rounds
    — the shape the SQL oracle unrolls; only pass ``tol`` for
    exploratory runs where oracle parity is not required."""
    cents = (
        emb.orderBy(F.col(id_col).asc()).limit(k)
        .select(
            F.col(id_col).alias("cid"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    assigned = None
    for it in range(iters):
        assigned = kmeans_assign(emb, cents, dim, id_col, vec_col)
        if it == iters - 1 and tol is None:
            # the LAST round's assignment feeds both the update and
            # the membership counts — materialize it once instead of
            # running the (compute-bound) broadcast fold twice.  Only
            # on the fixed-iters path: with tol any round may be last.
            assigned = assigned.localCheckpoint(eager=True)
        new_cents = kmeans_update(assigned, vec_col).localCheckpoint(eager=True)
        if tol is not None:
            # FULL OUTER join on cid (r5 advice): a cluster that lost
            # every member is absent from new_cents, and an inner join
            # would silently drop it from the shift metric — declaring
            # convergence despite cluster death.  A cid present on
            # only one side counts as an INFINITE shift, so iteration
            # keeps going (and the death stays visible in the final
            # membership counts).
            shift_col = F.when(
                F.col("n.c").isNull() | F.col("o.c").isNull(),
                F.lit(float("inf")),
            ).otherwise(
                F.aggregate(
                    F.zip_with(
                        F.col("n.c"), F.col("o.c"), lambda a, b: F.abs(a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: F.greatest(acc, x),
                )
            )
            shift = (
                new_cents.alias("n")
                .join(cents.alias("o"), "cid", "full_outer")
                .agg(F.max(shift_col).alias("s"))
                .collect()[0]["s"]
            )
            cents = new_cents
            # shift is None only when BOTH sides are empty (k=0 —
            # impossible for a seeded run): treat as not-converged.
            if shift is not None and shift <= tol:
                break
        else:
            cents = new_cents
    norm = F.sqrt(
        F.aggregate(
            F.col("c"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    counts = assigned.groupBy("cid").agg(F.count("*").alias("n_members"))
    return (
        counts.join(cents, "cid")
        .select("cid", "n_members", F.round(norm, 6).alias("centroid_norm"))
        .orderBy("cid")
    )


# ---- Product quantization (PQ) ---------------------------------------------
# The FAISS-style compression path composing the two r4 debuts: the
# vector splits into m subspaces, each learns a k-codeword codebook
# via the same Lloyd machinery as kmeans_iterate, and a vector is
# stored as m small codes (log2(k) bits each) instead of dim floats.
# ADC (asymmetric distance computation) then searches the compressed
# corpus: the QUERY keeps full precision, corpus distances come from
# per-subspace codeword distances — the memory/recall trade every
# billion-vector ANN deployment makes (Jegou et al., TPAMI'11).


def _subvec(vec: Column, s: int, dsub: int) -> Column:
    """Subspace s's slice of the vector (1-based, length dsub)."""
    return F.slice(vec, s * dsub + 1, dsub)


def _pq_packed_books(cents: DataFrame) -> DataFrame:
    """(sub, cid, c) codebooks -> ONE row holding a sub-ordered array
    of cid-ordered codebooks — the broadcast payload for zero-shuffle
    encode/ADC (m*k*dsub doubles — KBs for any sane PQ config)."""
    per_sub = cents.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cw")
    )
    return per_sub.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("sub", "cw"))).alias("__books")
    )


def pq_train(
    emb: DataFrame,
    m: int,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train m per-subspace codebooks of k codewords each: ALL
    subspaces iterate in ONE Lloyd loop — the corpus explodes to
    (vec_id, sub, sv) rows (a narrow m-fold map, no shuffle) and each
    round runs one broadcast assignment plus one (sub, cid, pos)
    mean shuffle producing O(m*k) rows, so the JOB COUNT is
    independent of m (training the subspaces one at a time would run
    m times the rounds).  Seeds: subspace slices of the k lowest-id
    vectors, cid = 0..k-1 in id order (the id-rank window runs on a
    k-row frame — never the corpus).  Centroids are
    localCheckpoint'ed per round (same lineage discipline as
    kmeans_iterate).  Returns (sub, cid, c) — m*k broadcast-sized
    rows."""
    dsub = dim // m
    seed_w = Window.orderBy(F.col(id_col).asc())
    seeds = (
        emb.orderBy(F.col(id_col).asc()).limit(k)
        .withColumn("cid", (F.row_number().over(seed_w) - 1).cast("bigint"))
    )
    cents = (
        seeds.select(
            "cid",
            F.posexplode(
                F.array(*[
                    F.transform(
                        _subvec(F.col(vec_col), s, dsub),
                        lambda x: x.cast("double"),
                    )
                    for s in range(m)
                ])
            ).alias("sub", "c"),
        )
        .select("sub", "cid", "c")
        .localCheckpoint(eager=True)
    )
    subv = emb.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[_subvec(F.col(vec_col), s, dsub) for s in range(m)])
        ).alias("sub", "sv"),
    )
    for _ in range(iters):
        packed = cents.groupBy("sub").agg(
            F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("__cents")
        )
        best = _nearest_codeword(F.col("sv"), F.col("__cents"))
        assigned = subv.join(F.broadcast(packed), "sub").select(
            id_col, "sub", "sv", best["cid"].alias("cid")
        )
        per_dim = (
            assigned.select("sub", "cid", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub", "cid", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                    / F.count("v")
                ).alias("mean_v")
            )
        )
        cents = (
            per_dim.groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean_v"))),
                    lambda s: s["mean_v"],
                ).alias("c")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def pq_encode(
    emb: DataFrame,
    cents: DataFrame,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
    keep_subspace_dists: bool = False,
) -> DataFrame:
    """PQ-encode every vector: per subspace the nearest codeword
    (ties -> lowest cid) via the same broadcast fold as
    kmeans_assign — the m*k codebooks pack into ONE broadcast row and
    the corpus is scanned once with ZERO shuffle (pinned in
    tests/test_plans.py).  Returns (vec_id, *keep_cols, codes
    array<bigint>, mse double): codes[s] is subspace s's codeword id,
    mse the exact reconstruction error sum(d_s)/dim with the d_s
    added in subspace order (the oracle adds them in the same
    order).  ``keep_cols`` carries extra columns (e.g. the IVF list
    label) through the encode unchanged; ``keep_subspace_dists``
    additionally emits the raw per-subspace squared distances as a
    ``dists`` array<double> (the subspace-distortion audit's
    input)."""
    dsub = dim // m
    books = _pq_packed_books(cents)
    vec = F.col(vec_col)
    staged = emb.crossJoin(F.broadcast(books)).select(
        id_col,
        vec_col,
        *keep_cols,
        *[
            _nearest_codeword(
                _subvec(vec, s, dsub),
                F.element_at(F.col("__books"), s + 1)["cw"],
            ).alias(f"_b{s}")
            for s in range(m)
        ],
    )
    mse = F.lit(0.0)
    for s in range(m):
        mse = mse + F.col(f"_b{s}")["d"]
    extra = (
        [F.array(*[F.col(f"_b{s}")["d"] for s in range(m)]).alias("dists")]
        if keep_subspace_dists
        else []
    )
    return staged.select(
        id_col,
        *keep_cols,
        F.array(*[F.col(f"_b{s}")["cid"] for s in range(m)]).alias("codes"),
        (mse / dim).alias("mse"),
        *extra,
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: DataFrame,
    m: int,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC approximate top-k over the PQ-compressed corpus: the query
    keeps its full vector, each corpus row contributes only its m
    codes, and the approximate squared-L2 distance is the sum of the
    query-subspace-to-codeword distances looked up by code.

    Scale shape: the corpus is encoded in one zero-shuffle pass
    (pq_encode) and then never touches its floats again — the scoring
    stage streams (neighbor_id, codes) rows against a BROADCAST
    (queries x codebooks) side.  The per-(query, subspace, codeword)
    distance table (the classic ADC LUT — m*k doubles per query) is
    PRECOMPUTED on the broadcast side, so the per-pair work is m
    O(k) cid lookups and m-1 adds — no per-pair dsub-length fold —
    and the only exchange is the per-query top-k window.  The LUT
    entries are the SAME sequential _sqdist folds the oracle
    computes, just evaluated once per query instead of once per
    pair, so results are bit-identical to the inline formulation."""
    dsub = dim // m
    enc = pq_encode(corpus, cents, m, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    q_lut = _adc_luts(q, _pq_packed_books(cents), m, dsub).drop("query_vec")
    scored = (
        enc.crossJoin(F.broadcast(q_lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_adc_dist(m), 6).alias("approx_dist"),
        )
    )
    return _topk_by_dist(scored, k)


def _adc_luts(q: DataFrame, books: DataFrame, m: int, dsub: int) -> DataFrame:
    """ADC lookup tables: per subspace, the (cid, d) distances from
    each query's sub-vector to every codeword — evaluated once on the
    |queries|-row broadcast side (the classic m*k-doubles-per-query
    ADC table), using the SAME sequential _sqdist fold the oracle
    computes so downstream sums are bit-identical to the inline
    formulation."""

    def lut(s: int) -> Column:
        book = F.element_at(F.col("__books"), s + 1)["cw"]
        return F.transform(
            book,
            lambda x: F.struct(
                x["cid"].alias("cid"),
                _sqdist(_subvec(F.col("query_vec"), s, dsub), x["c"]).alias("d"),
            ),
        )

    return q.crossJoin(books).select(
        "*", *[lut(s).alias(f"_lut{s}") for s in range(m)]
    ).drop("__books")


def _adc_dist(m: int) -> Column:
    """Approximate squared L2 from the m LUTs and a ``codes`` column.
    Codeword lookup is BY CID (not array position — a codebook that
    lost a cluster has a sparse cid set) via filter + element_at: the
    single matching LUT entry contributes its d.  A code that matches
    NO LUT entry (codes encoded against a different/stale codebook
    than the LUTs were built from) yields NULL — the whole distance
    goes NULL and the mismatch SURFACES in the output instead of
    silently understating distances (r5 advice; the previous additive
    fold contributed +0.0 for a missing cid).  Healthy runs never hit
    the NULL path, and the matched-entry sum is the identical
    d0+d1+...+d(m-1) the fold produced, so certified results are
    unchanged."""

    def sub_dist(s: int) -> Column:
        code = F.element_at(F.col("codes"), s + 1)
        hit = F.filter(F.col(f"_lut{s}"), lambda x: x["cid"] == code)
        # try_element_at: an empty hit array is the stale-codebook
        # case and must become NULL, not an ANSI index error
        return F.try_element_at(hit, F.lit(1))["d"]

    dist = sub_dist(0)
    for s in range(1, m):
        dist = dist + sub_dist(s)
    return dist


def _topk_by_dist(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rnk")
    )


def ivf_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    pq_cents: DataFrame,
    m: int,
    dim: int,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jegou et al., TPAMI'11 — the FAISS billion-scale
    layout): the coarse IVF quantizer (per-label centroids) restricts
    each query to its ``nprobe`` nearest inverted lists BY SQUARED L2
    (the ADC metric, unlike ivf_topk's cosine probe), and ADC then
    scores only those lists' PQ codes.

    Scale shape: corpus floats are touched exactly once (the
    zero-shuffle pq_encode, label carried through); scoring joins the
    (label-partitionable) code table against a BROADCAST
    (probes x LUTs) side, so per query only nprobe/|labels| of the
    corpus is scored and each scored pair costs m O(k) lookups.
    Versus pq_adc_topk this trades recall (list pruning) for a
    1/|labels|*nprobe scoring-volume cut — the standard
    billion-vector operating point."""
    dsub = dim // m
    cents_ivf = (
        centroids
        if centroids is not None
        else label_centroids(corpus, id_col, vec_col, label_col)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_d").asc(), F.col(label_col).asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents_ivf))
        .select(
            "query_id",
            "query_vec",
            F.col(label_col),
            # 6dp-rounded probe distance (same engine-portability move
            # as ivf_topk's rounded cosine probe): the centroids are
            # decimal-mean values whose float->decimal cast can differ
            # ~1e-10 per element across engines, so ranking on the
            # rounded distance keeps the probed-list set — and hence
            # the certified result — identical on any engine.
            F.round(_sqdist(F.col("query_vec"), F.col("centroid")), 6).alias("cent_d"),
        )
        .withColumn("probe_rnk", F.row_number().over(probe_w))
        .filter(F.col("probe_rnk") <= nprobe)
        .select("query_id", "query_vec", label_col)
    )
    probe_luts = _adc_luts(probes, _pq_packed_books(pq_cents), m, dsub).drop(
        "query_vec"
    )
    enc = pq_encode(
        corpus, pq_cents, m, dim, id_col, vec_col, keep_cols=(label_col,)
    ).select(F.col(id_col).alias("neighbor_id"), label_col, "codes")
    scored = (
        enc.join(F.broadcast(probe_luts), label_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_adc_dist(m), 6).alias("approx_dist"),
        )
    )
    return _topk_by_dist(scored, k)


def kmeans_assign_batch(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Production GEMM twin of :func:`kmeans_assign`: the O(k)
    centroid rows (broadcast-sized by construction) are collected and
    baked into one Arrow-batched pandas UDF that scores every batch
    with a single numpy matmul — the same ~20x batch-over-fold win
    the LSH bucketer measured, for the corpora where the interpreted
    fold is the bottleneck (BASELINE.md: emb_kmeans is
    fold-arithmetic-bound, not shuffle-bound).

    Same zero-shuffle shape as the fold path.  NOT the
    oracle-certified path: GEMM summation order can flip a genuine
    near-tie (< ~1e-13 relative distance gap); the equivalence test
    shows zero flips on the test corpus, and certified queries keep
    the fold."""
    import numpy as np

    from crypto_price_tracker_with_etl_dashboard_spark.functions._kmeans_udf import (
        kmeans_assign_udf,
    )

    rows = sorted(cents.collect(), key=lambda r: r["cid"])
    c = np.array([r["c"] for r in rows], dtype=np.float64)
    ids = np.array([r["cid"] for r in rows], dtype=np.int64)
    udf = kmeans_assign_udf(c, ids)
    return emb.select(id_col, vec_col, *keep_cols, udf(F.col(vec_col)).alias("cid"))


def pq_encode_batch(
    emb: DataFrame,
    cents: DataFrame,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Production GEMM twin of :func:`pq_encode`: the O(m*k) codebook
    rows are collected and baked into one Arrow-batched pandas UDF
    that encodes each batch with m numpy GEMMs (one per subspace) —
    same zero-shuffle scan shape as the fold path, ~20x less per-row
    arithmetic (the fold is the documented compute bottleneck of the
    PQ family at scale, BASELINE.md).  NOT the oracle-certified path:
    ties and sub-1e-13 near-ties follow the GEMM score order; the
    ``emb_gemm_audit`` driver row counts fold-vs-GEMM code mismatches
    on the real corpus and asserts zero.  Returns (id, codes) only —
    reconstruction MSE stays on the certified fold path."""
    import numpy as np

    from crypto_price_tracker_with_etl_dashboard_spark.functions._kmeans_udf import (
        pq_codes_udf,
    )

    dsub = dim // m
    by_sub: dict[int, list] = {}
    for r in cents.collect():
        by_sub.setdefault(r["sub"], []).append(r)
    if sorted(by_sub) != list(range(m)):
        raise ValueError(f"codebooks cover subs {sorted(by_sub)}, expected 0..{m-1}")
    books, cidss = [], []
    for s in range(m):
        rows = sorted(by_sub[s], key=lambda r: r["cid"])
        books.append(np.array([r["c"] for r in rows], dtype=np.float64))
        cidss.append(np.array([r["cid"] for r in rows], dtype=np.int64))
    udf = pq_codes_udf(books, cidss, dsub)
    return emb.select(id_col, *keep_cols, udf(F.col(vec_col)).alias("codes"))


# Last cached assigned-corpus DataFrame per Spark application, so a
# repeated semdedup() call can evict its predecessor (see in-function
# comment).  Keyed by applicationId, not id(session): id() values are
# reused after GC.
_SEMDEDUP_CACHE: dict[str, DataFrame] = {}


def semdedup(
    emb: DataFrame,
    cents: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic
    deduplication: assign every vector to its nearest centroid (the
    same zero-shuffle broadcast fold as :func:`kmeans_assign`), then
    within each cluster drop every vector that has a LOWER-id
    neighbor with cosine >= ``threshold`` — the keep-lowest-id
    representative rule, the deterministic stand-in for the paper's
    keep-one-per-epsilon-ball.

    Scale shape: clustering is what makes this tractable — the
    quadratic candidate stage is bounded per cluster (pairs ~
    n^2/k for balanced clusters), so k is chosen proportional to
    corpus size (the paper uses k ~ sqrt(n*avg_cluster)); the pair
    stage is ONE equi-join on cid (never all-pairs), and norms are
    precomputed per row so each pair folds a single dot product.
    Output is O(k) rows: per-cluster member/dropped/kept counts.
    """
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    assigned = kmeans_assign(emb, cents, dim, id_col, vec_col)
    side = (
        fan_out(assigned)
        .withColumn("nrm", _norm(F.col(vec_col)))
        .cache()
    )
    # The cache serves BOTH consumers of `side` (pair join + member
    # counts) inside one action, so it cannot be unpersisted before
    # return — but repeated calls (bench runs the query 2-3x) must
    # not stack full-corpus copies in executor memory.  Evict the
    # previous invocation's cache on re-entry: residency is bounded
    # at one assigned-corpus copy per session.
    prev = _SEMDEDUP_CACHE.get(emb.sparkSession.sparkContext.applicationId)
    if prev is not None:
        prev.unpersist()
    _SEMDEDUP_CACHE[emb.sparkSession.sparkContext.applicationId] = side
    a, b = side.alias("a"), side.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            F.round(
                _pair_cosine(
                    F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                    F.col("a.nrm"), F.col("b.nrm"),
                ),
                6,
            )
            >= threshold
        )
        .select(F.col("b.cid").alias("cid"), F.col(f"b.{id_col}").alias("did"))
        .distinct()
    )
    members = side.groupBy("cid").agg(F.count("*").alias("n_members"))
    drops = dropped.groupBy("cid").agg(F.count("*").alias("n_dropped"))
    return (
        members.join(drops, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("cid")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN classification by majority label vote among the k nearest
    labeled corpus rows (cosine; exact ties on the vote count break
    to the LOWEST label).  The held-out queries keep their vectors;
    the corpus provides (vector, label).

    Scale shape: the expensive stage is the existing
    :func:`brute_force_topk` scan (corpus read once, query set
    broadcast); the label join then BROADCASTS the |queries|*k result
    against the corpus's (id, label) projection, and the vote count +
    argmax are O(|queries|*k) rows — nothing quadratic past the
    scoring stage.  Swap in :func:`random_hyperplane_lsh_topk` or
    :func:`ivf_topk` for the neighbor stage at billion-vector scale
    (same output contract)."""
    topk = brute_force_topk(corpus, queries, id_col, vec_col, k)
    nb_labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col)
    )
    votes = (
        nb_labels.join(F.broadcast(topk), "neighbor_id")
        .groupBy("query_id", label_col)
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col(label_col).alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
        .orderBy("query_id")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Contrastive hard-negative mining: for every query row, the k
    most-similar corpus rows with a DIFFERENT label — the pairs a
    contrastive/metric-learning objective learns the most from
    (high-similarity negatives), and the standard companion to
    kNN-classify for curating training batches.

    Same plan shape as ``brute_force_topk`` (the right plan whenever
    the query set is broadcast-sized): queries broadcast, the corpus
    scanned ONCE and never shuffled; the label-inequality predicate
    rides the same map stage as the cosine fold, so negatives cost
    nothing extra.  Ties broken by neighbor id ascending.
    """
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__qlbl"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("__clbl"),
            F.col(vec_col).alias("vec"),
        )
    ).select("neighbor_id", "__clbl", "vec", _norm(F.col("vec")).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("__clbl") != F.col("__qlbl"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("__clbl").alias("neighbor_label"),
            F.round(
                _pair_cosine(F.col("query_vec"), F.col("vec"), F.col("qn"), F.col("cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine_sim", "rnk")
    )


def rp_signs(j: int, d: int) -> int:
    """Deterministic +/-1 for output dim j, input dim d — the md5
    parity family (portable: the DuckDB oracle regenerates the same
    signs with hex-substring arithmetic, like the LSH hyperplanes)."""
    import hashlib

    h = hashlib.md5(f"rp:{j}:{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def rp_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 8,
    scale: int = 10_000,
    impl: str = "hof",
) -> DataFrame:
    """Random projection (sign/Achlioptas sparse variant, density 1):
    project ``dim``-d embeddings to ``out_dim`` dims with a
    deterministic +/-1 matrix.  The Johnson-Lindenstrauss workhorse
    for cheap dimensionality reduction ahead of clustering / ANN
    candidate generation.

    Exactness: elements are fixed-point BIGINTs (round(x*scale)), so
    each output dim is an INTEGER linear combination — associative,
    commutative, partitioning-invariant, and bit-identical on the
    DuckDB oracle regardless of summation order (a double fold would
    depend on element order).  Both impls produce IDENTICAL values
    (asserted in tests/test_similarity.py).

    Plan: pure map — zero shuffles, no UDFs — in either impl; the
    knob is WHERE the per-row cost sits:

    - ``impl="hof"`` (default): transform + zip_with/aggregate.
      Small expression tree (analyzes in ~10 ms) but the lambdas
      evaluate interpreted (~0.5 us/element, ~dim*out_dim*2 evals
      per row) — right for interactive / moderate corpora.
    - ``impl="codegen"``: explicit element_at chains, fully inside
      whole-stage codegen (~100x less per-row CPU), at the price of
      a dim*out_dim-node expression tree Catalyst spends ~2-3 s
      analyzing ONCE per query.  At 100 TB the one-time planning
      cost is noise and this is the right impl.
    """
    if out_dim < 1 or dim < 1:
        raise ValueError(f"need dim >= 1 and out_dim >= 1, got {dim}, {out_dim}")
    if impl == "codegen":
        xs = [
            F.round(F.element_at(F.col(vec_col), d + 1).cast("double") * scale, 0)
            .cast("bigint")
            .alias(f"__x{d}")
            for d in range(dim)
        ]
        base = df.select(F.col(id_col), *xs)
        outs = []
        for j in range(out_dim):
            acc = None
            for d in range(dim):
                term = F.col(f"__x{d}")
                signed = term if rp_signs(j, d) > 0 else -term
                acc = signed if acc is None else acc + signed
            outs.append(acc.alias(f"rp{j}"))
        return base.select(F.col(id_col), *outs)
    if impl != "hof":
        raise ValueError(f"impl must be 'hof' or 'codegen', got {impl!r}")
    xu = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale, 0).cast("bigint")
    )
    outs = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(rp_signs(j, d)) for d in range(dim)])
        prod = F.zip_with(F.col("__xu"), signs, lambda x, s: x * s)
        outs.append(
            F.aggregate(prod, F.lit(0).cast("bigint"), lambda a, v: a + v).alias(
                f"rp{j}"
            )
        )
    return df.select(F.col(id_col), xu.alias("__xu")).select(F.col(id_col), *outs)


def sql_rp_project(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 8,
    scale: int = 10_000,
) -> str:
    """DuckDB twin of rp_project: regenerates the sign matrix from
    the same md5 parity and sums the same fixed-point integers."""
    # CAST: DuckDB SUM over BIGINT returns HUGEINT, which pandas
    # widens to float64 and the dtype gate rejects
    rp_cols = ", ".join(
        f"CAST(MAX(CASE WHEN j = {j} THEN v END) AS BIGINT) AS rp{j}"
        for j in range(out_dim)
    )
    return f"""
    WITH sgn AS (
      SELECT CAST(j AS INT) AS j, CAST(d AS INT) AS d,
             CASE WHEN ('0x' || substr(md5('rp:' || j || ':' || d), 1, 1))::INT
                       % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM range(0, {out_dim}) t1(j), range(0, {dim}) t2(d)
    ),
    elems AS (
      SELECT {id_col}, generate_subscripts({vec_col}, 1) - 1 AS d,
             CAST(ROUND(CAST(unnest({vec_col}) AS DOUBLE) * {scale}) AS BIGINT)
               AS xu
      FROM {table}
    ),
    sums AS (
      SELECT e.{id_col}, s.j, SUM(s.s * e.xu) AS v
      FROM elems e JOIN sgn s ON e.d = s.d
      GROUP BY e.{id_col}, s.j
    )
    SELECT {id_col}, {rp_cols} FROM sums GROUP BY {id_col}
    """


# ---- Farthest-point (k-center greedy) sampling ------------------------------
# Diverse-subset selection for training-data curation: pick the
# point farthest from every center chosen so far, k times (Gonzalez,
# TCS 1985 — a 2-approximation to the k-center objective).  Where
# stratified/mixture sampling balance KNOWN group labels, this
# maximizes COVERAGE of the embedding space itself — the "spread"
# selection behind coreset pickers.
#
# Scale shape: each round touches the corpus ONCE — a map computing
# the squared distance to the single NEWEST center (running-min with
# the carried distance), then one max(struct) aggregate for the next
# center; the state DataFrame is localCheckpoint'ed per round so
# lineage (and re-scans) never compound — k rounds = k scans, the
# kmeans_iterate discipline.  Driver traffic is one 1-row collect
# per round.  All distance arithmetic is the same left-to-right
# fold both engines evaluate identically, so an unrolled-CTE DuckDB
# oracle reproduces every selection bit-for-bit.


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 via the portable fold (zip_with + left-to-right
    aggregate — DuckDB's list_sum(list_transform(...)) twin)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kcenter_sample(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The k greedily-selected centers: (sel_order, id, sel_dist2 =
    squared distance to the nearest prior center at selection time;
    NULL for the seed).  Seed = min id (deterministic); farthest
    ties break toward the smaller id via max(struct(d2, -id))."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = emb.sparkSession
    seed = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(1)
        .collect()[0]
    )
    chosen: list[tuple[int, int, float | None]] = [(1, seed[id_col], None)]
    center_vec = [float(x) for x in seed[vec_col]]
    state = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    lit_center = F.array(*[F.lit(x) for x in center_vec])
    state = state.select(
        "__id", "__v", _dist2(F.col("__v"), lit_center).alias("__d2")
    ).localCheckpoint(eager=True)
    for r in range(2, k + 1):
        far = state.agg(
            F.max(F.struct(F.col("__d2"), (-F.col("__id")).alias("__neg")))
            .alias("m")
        ).collect()[0]["m"]
        next_id = -far["__neg"]
        chosen.append((r, next_id, far["__d2"]))
        if r == k:
            break
        vec = [
            float(x)
            for x in state.filter(F.col("__id") == next_id)
            .select("__v").collect()[0]["__v"]
        ]
        lit_c = F.array(*[F.lit(x) for x in vec])
        state = state.select(
            "__id", "__v",
            F.least(F.col("__d2"), _dist2(F.col("__v"), lit_c)).alias("__d2"),
        ).localCheckpoint(eager=True)
    # explicit schema: at k=1 the only sel_dist2 is None and type
    # inference would fail
    out = spark.createDataFrame(
        chosen, f"sel_order int, {id_col} bigint, sel_dist2 double"
    )
    return out.orderBy("sel_order")


def sql_kcenter_sample(k: int, dim: int) -> str:
    """DuckDB mirror of :func:`kcenter_sample`: k-1 unrolled
    farthest-point rounds (argmax CTEs are legal outside WITH
    RECURSIVE) over the embeddings table."""
    def d2(alias: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim} + 1), i -> "
            f"(CAST(e.embedding[i] AS DOUBLE) - CAST({alias}.embedding[i] AS DOUBLE))"
            f" * (CAST(e.embedding[i] AS DOUBLE) - CAST({alias}.embedding[i] AS DOUBLE))))"
        )

    parts = [
        "c1 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 1)",
        f"""d1 AS (
      SELECT e.vec_id, e.embedding, {d2('c')} AS d2
      FROM embeddings e CROSS JOIN c1 c
    )""",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""c{r} AS (
      SELECT vec_id, embedding, d2 FROM d{r - 1}
      ORDER BY d2 DESC, vec_id ASC LIMIT 1
    )"""
        )
        if r < k:
            parts.append(
                f"""d{r} AS (
      SELECT e.vec_id, e.embedding, least(e.d2, {d2('c')}) AS d2
      FROM d{r - 1} e CROSS JOIN c{r} c
    )"""
            )
    selects = [
        "SELECT 1 AS sel_order, vec_id, CAST(NULL AS DOUBLE) AS sel_dist2 FROM c1"
    ] + [
        f"SELECT {r} AS sel_order, vec_id, d2 AS sel_dist2 FROM c{r}"
        for r in range(2, k + 1)
    ]
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    SELECT CAST(sel_order AS INT) AS sel_order,"
          " vec_id, sel_dist2 FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY sel_order"
    )



# ---- 1-bit (sign-threshold) binary quantization ------------------------------
# The most aggressive compression tier below PQ: each dimension
# collapses to one bit (above / not-above the per-dim corpus mean),
# the 64-dim vector to two 32-bit words, and similarity to Hamming
# distance = popcount(xor) — integer-exact, so the whole retrieval
# path is oracle-checkable bit-for-bit (no float scoring at all).
# This is the binary-embedding serving layout (32x smaller than
# float32, SIMD-popcount scan); the float path stays the reranker.
#
# Packing uses 32-bit words, NOT one 64-bit word: building bit 63
# via 1<<63 overflows signed BIGINT on both engines; two half-words
# keep every intermediate positive and portable.
_BQ_WORD_BITS = 32


def _bq_word(vec_col: str, thr_col: str, lo: int, bits: int) -> Column:
    """BIGINT word packing ``bits`` sign bits of vec[lo..lo+bits-1]
    (1-indexed dims) against per-dim thresholds."""
    return F.expr(
        f"aggregate(sequence({lo}, {lo + bits - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + (CASE WHEN CAST({vec_col}[i - 1] AS DOUBLE)"
        f" > {thr_col}[i - 1] THEN shiftleft(CAST(1 AS BIGINT), i - {lo})"
        f" ELSE CAST(0 AS BIGINT) END))"
    )


def binary_thresholds(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """1-row DataFrame with ``thr``: the per-dim corpus means in an
    array (exact DECIMAL sums, one double division per dim — the IVF
    centroid discipline), ready to broadcast."""
    per_dim = (
        df.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(38,10)")).cast("double")
                / F.count("v")
            ).alias("mean_v")
        )
    )
    return per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "mean_v"))
        ).alias("__s")
    ).select(F.expr("transform(__s, x -> x.mean_v)").alias("thr"))


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
) -> DataFrame:
    """Top-k by Hamming distance over sign-bit codes.  Plan shape:
    thresholds (1 row) broadcast onto both sides; the corpus packs
    ONCE in a narrow map (at scale: persist the two BIGINT words and
    drop the floats — the 32x-compressed serving table); packed
    queries broadcast onto the packed corpus, per pair two
    xor+popcount integer ops inside codegen.  Ties break on
    neighbor id ascending."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import fan_out

    if dim % _BQ_WORD_BITS != 0:
        raise ValueError(f"dim must be a multiple of {_BQ_WORD_BITS}")
    thr = F.broadcast(binary_thresholds(corpus, vec_col, dim))
    words = [
        (f"w{j}", _bq_word(vec_col, "thr", 1 + j * _BQ_WORD_BITS, _BQ_WORD_BITS))
        for j in range(dim // _BQ_WORD_BITS)
    ]
    c = fan_out(corpus.select(id_col, vec_col)).crossJoin(thr).select(
        F.col(id_col).alias("neighbor_id"),
        *[w.alias(f"c_{n}") for n, w in words],
    )
    q = queries.select(id_col, vec_col).crossJoin(thr).select(
        F.col(id_col).alias("query_id"),
        *[w.alias(f"q_{n}") for n, w in words],
    )
    ham = sum(
        F.bit_count(F.expr(f"c_{n} ^ q_{n}")) for n, _ in words
    ).cast("bigint")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", ham.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )
