"""Distributed exact global ranking — order statistics without a
single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses
the whole relation onto one task: the textbook scale trap (the same
one BM25's top-k and pack_chunks' running sum avoid).  This module
is the reusable form of pack_chunks' answer: rows get a
MONOTONE-in-the-sort-key bucket id, rank within each bucket in
parallel, and the per-bucket row counts — a tiny relation, one row
per bucket — prefix-sum into offsets that broadcast back.  The
result is the exact global rank at full parallelism; the only
partitionless window runs over the O(buckets) totals.

Downstream of an exact rank, any order statistic is a map: quantile
membership ``1 + (q * (rank-1)) div n``, top-k cuts, percentile
scores.  The quantile queries (orders_rfm_segments,
events_eqdepth_histogram) certify this against DuckDB's plain
``row_number()`` — same ranks, radically different plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    bucket: Column,
    out_col: str = "rank",
) -> DataFrame:
    """Exact 1-based global rank of each row under ``order_by``.

    ``bucket`` must be integer-valued and MONOTONE in the leading
    sort key (e.g. ``floor(metric)`` for an ascending metric sort):
    every row of bucket i sorts before every row of bucket i+1.
    Monotonicity is the caller's contract — it is what lets ranks
    concatenate across buckets without comparing rows between them.

    Plan: one shuffle on the bucket id (rank window + bucket counts
    share it), a prefix-sum window over the O(buckets) totals, and a
    broadcast join back.  No corpus-sized relation ever sorts on one
    task.
    """
    dfb = df.withColumn("__rb", bucket.cast("bigint"))
    w_in = Window.partitionBy("__rb").orderBy(*order_by)
    dfb = dfb.withColumn("__rn_in", F.row_number().over(w_in))
    totals = dfb.groupBy("__rb").agg(F.count("*").alias("__bn"))
    w_off = Window.orderBy("__rb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).select("__rb", "__off")
    return (
        dfb.join(F.broadcast(offsets), "__rb")
        .withColumn(out_col, (F.col("__off") + F.col("__rn_in")).cast("bigint"))
        .drop("__rb", "__rn_in", "__off")
    )


def quantile_bucket(rank: Column, n: Column, q: int) -> Column:
    """Equi-depth bucket 1..q from an exact rank: the NTILE closed
    form ``1 + (q * (rank - 1)) div n`` (integer arithmetic, so both
    engines agree on every boundary row).

    NOTE this is the floor-division equi-depth definition, NOT ANSI
    NTILE: NTILE gives the first ``n % q`` buckets one extra row,
    while this form spreads remainders by position.  Oracles must
    use the same closed form over ``row_number()`` (not ``ntile()``)
    — the certified queries do.

    The quotient evaluates in double before the floor, exact while
    ``q * rank < 2^53`` (~9e15; q=5 leaves room for ~1.8e15 rows —
    beyond any single ranked relation here)."""
    return (
        F.floor((F.lit(q) * (rank - F.lit(1))) / n) + F.lit(1)
    ).cast("bigint")


def sql_quantile_bucket(rank_expr: str, n_expr: str, q: int) -> str:
    """DuckDB twin of :func:`quantile_bucket`."""
    return f"(1 + ({q} * ({rank_expr} - 1)) // ({n_expr}))"
