"""Matrix-free spectral decomposition: the top principal direction
of an embedding table by power iteration.

Power iteration (von Mises & Pollaczek-Geiringer, 1929) finds the
dominant eigenvector of the Gram matrix X^T X without ever
materializing it: v <- normalize(X^T (X v)).  Each round is two
corpus-free-shape passes — a per-row dot product (narrow map) and a
per-dimension sum (one shuffle onto <= dim groups) — so a 100 TB
corpus pays O(rows x dim) compute and a dim-row shuffle per round,
with only the O(dim) vector crossing the driver between rounds (the
same k-row-table allowance as kmeans_iterate's centroids).

Exactness discipline: a naive float implementation sums doubles over
corpus rows in shuffle order — not reproducible, and impossible to
oracle.  Instead each row's dot product is ppm-quantized to BIGINT,
and each (row, dim) contribution round(x_i * dot_ppm) is a BIGINT
too, so the per-dimension sums are EXACT integers under any
partitioning; the only float steps are the norm chain
(sum-of-squares in DECIMAL(38,0) -> double -> sqrt -> divide), a
fixed sequence both engines (and the driver's Python, for the
intermediate rounds) evaluate identically.  The quantization
perturbs the iterate by < 1e-6 relative — irrelevant to where the
iteration converges, decisive for bit-reproducibility.

Not a full PCA (no mean-centering, one component): the top direction
of the UNcentered second moment, which is what embedding-norm
analyses (anisotropy, "rogue dimensions") actually use.  Center
upstream with emb_dim_stats' means if covariance PCA is wanted.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _dot_ppm(vec_col: str, v: list[float]):
    vlit = F.array(*[F.lit(float(x)) for x in v])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), vlit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return F.round(dot * PPM).cast("bigint")


def _dim_sums(rows: DataFrame, vec_col: str, v: list[float]) -> DataFrame:
    """One power-iteration half-step: exact BIGINT per-dimension sums
    of round(x_i * dot_ppm) over all rows; i is 1-based."""
    contrib = rows.select(
        F.posexplode(vec_col).alias("pos", "x"),
        _dot_ppm(vec_col, v).alias("dp"),
    )
    return (
        contrib.groupBy((F.col("pos") + 1).alias("i"))
        .agg(
            F.sum(F.round(F.col("x").cast("double") * F.col("dp")).cast("bigint"))
            .alias("w")
        )
    )


def power_iteration_top_pc(
    emb: DataFrame,
    dim: int,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal direction after ``iters`` power-iteration rounds
    from the deterministic start e1.  Returns (dim_idx 1-based,
    loading) — the unit-norm direction, rounded to 6 dp.

    The final round's normalization runs IN-ENGINE (decimal
    sum-of-squares -> double chain); intermediate rounds collect the
    O(dim) integer sums to the driver and re-derive the unit vector
    with the byte-identical Python chain (int -> nearest-double ->
    sqrt -> divide), so an unrolled SQL oracle reproduces every round
    bit-for-bit.
    """
    if iters < 1:
        raise ValueError(f"power_iteration_top_pc needs iters >= 1, got {iters}")
    rows = emb.filter(F.col(vec_col).isNotNull())
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(iters - 1):
        sums = _dim_sums(rows, vec_col, v).orderBy("i").collect()
        if len(sums) != dim:
            raise ValueError(
                f"expected {dim} dimension sums, got {len(sums)} — "
                f"ragged or empty {vec_col}?"
            )
        w = [int(r["w"]) for r in sums]
        nrm = math.sqrt(float(sum(wi * wi for wi in w)))
        v = [wi / nrm for wi in w]
    final = _dim_sums(rows, vec_col, v)
    dec = "decimal(38,0)"
    nrm = final.agg(
        F.sqrt(
            F.sum(F.col("w").cast(dec) * F.col("w").cast(dec)).cast("double")
        ).alias("nrm")
    )
    return (
        final.crossJoin(F.broadcast(nrm))
        .select(
            F.col("i").alias("dim_idx"),
            F.round(F.col("w").cast("double") / F.col("nrm"), 6).alias("loading"),
        )
        .orderBy("dim_idx")
    )


def sql_power_iteration_top_pc(
    table: str, dim: int, iters: int = 2, vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of :func:`power_iteration_top_pc`: the identical
    rounds unrolled as CTEs, the iterate carried as a DOUBLE[] list
    rebuilt each round with the same int -> double -> sqrt -> divide
    chain."""
    v0 = "[" + ", ".join(["1.0"] + ["0.0"] * (dim - 1)) + "]"
    ctes = [
        f"rows_in AS (SELECT {vec_col} AS e FROM {table} WHERE {vec_col} IS NOT NULL)",
        f"v0 AS (SELECT CAST({v0} AS DOUBLE[]) AS v)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"d{k} AS (SELECT e, CAST(round(list_sum(list_transform("
            f"range(1, {dim} + 1), i -> CAST(e[i] AS DOUBLE) * v[i]))"
            f" * {PPM}) AS BIGINT) AS dp FROM rows_in, v{k - 1})"
        )
        ctes.append(
            f"w{k} AS (SELECT t.i, CAST(SUM(CAST(round(CAST(e[t.i] AS DOUBLE)"
            f" * dp) AS BIGINT)) AS BIGINT) AS w"
            f" FROM d{k} CROSS JOIN range(1, {dim} + 1) t(i) GROUP BY t.i)"
        )
        ctes.append(
            f"n{k} AS (SELECT sqrt(CAST(SUM(CAST(w AS DECIMAL(38,0))"
            f" * CAST(w AS DECIMAL(38,0))) AS DOUBLE)) AS nrm FROM w{k})"
        )
        if k < iters:
            ctes.append(
                f"v{k} AS (SELECT list(CAST(w AS DOUBLE) / nrm ORDER BY i) AS v"
                f" FROM w{k}, n{k})"
            )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT i AS dim_idx, round(CAST(w AS DOUBLE) / nrm, 6) AS loading"
        + f"\n    FROM w{iters}, n{iters} ORDER BY dim_idx"
    )
