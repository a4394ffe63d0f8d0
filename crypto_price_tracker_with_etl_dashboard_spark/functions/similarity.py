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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for every query row, the k nearest corpus
    rows (excluding itself).  Ties broken by neighbor id ascending."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 6).alias("cosine_sim"),
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
        out = out + F.when(_dot(vec, plane) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return out


def _lsh_tables(vec: Column, dim: int, n_planes: int, n_tables: int) -> Column:
    """Exploded (table_idx, bucket) pairs for OR-amplified LSH: a
    corpus/query pair is a candidate iff the buckets match in ANY
    table.  More tables -> higher recall, linearly more candidates."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_idx"),
                    lsh_bucket(vec, dim, n_planes, table=t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
    )


def random_hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to rows sharing the
    query's LSH bucket in at least one of ``n_tables`` hash tables
    (OR-amplification), then exact cosine re-rank.  The bucket
    equi-join replaces the cross join — at scale this shuffles each
    side once on a small (table, bucket) key instead of scoring
    |corpus| x |queries| pairs; recall is tuned with n_tables (up)
    and n_planes (selectivity up, recall down).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _lsh_tables(F.col(vec_col), dim, n_planes, n_tables).alias("t"),
    ).select("neighbor_id", "vec", "t.table_idx", "t.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _lsh_tables(F.col(vec_col), dim, n_planes, n_tables).alias("t"),
    ).select("query_id", "query_vec", "t.table_idx", "t.bucket")
    scored = (
        c.join(F.broadcast(q), ["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair colliding in several tables must be scored once
        .select("query_id", "neighbor_id", "query_vec", "vec")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 6).alias("cosine_sim"),
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
