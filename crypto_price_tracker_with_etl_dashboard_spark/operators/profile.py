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

Determinism: counts and string min/max only — no floating-point
arithmetic.  Float/double columns render min/max through
DECIMAL(38,6): Spark's default double->string uses Java
``Double.toString`` (scientific notation at >= 1e7 and < 1e-3,
e.g. '1.23456789E7'), DuckDB's VARCHAR cast prints positional
('12345678.9') — the decimal hop pins both engines to the same
fixed 6-fraction-digit rendering for any magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def _as_string(col, is_float: bool):
    if is_float:
        return col.cast("decimal(38,6)").cast("string")
    return col.cast("string")


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max rendered as strings
    (timestamps in ISO form via Spark's default cast; floats at a
    fixed 6 decimal places, see module docstring)."""
    if not cols:
        raise ValueError("profile needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in profile list: {cols}")
    float_cols = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (FloatType, DoubleType))
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_f = c in float_cols
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            _as_string(F.min(F.col(c)), is_f).alias(f"__min_{c}"),
            _as_string(F.max(F.col(c)), is_f).alias(f"__max_{c}"),
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


def sql_profile(table: str, cols: list[str], float_cols: set[str] = frozenset()) -> str:
    """DuckDB mirror of :func:`profile` (UNION ALL of per-column
    aggregate rows — the single-WITH-pass formulation DuckDB
    optimizes the same way).  ``float_cols`` names the columns that
    take the DECIMAL(38,6) rendering hop (SQL has no schema to
    inspect, so the caller declares them)."""

    def render(c: str) -> tuple[str, str]:
        if c in float_cols:
            return (
                f"CAST(CAST(MIN({c}) AS DECIMAL(38,6)) AS VARCHAR)",
                f"CAST(CAST(MAX({c}) AS DECIMAL(38,6)) AS VARCHAR)",
            )
        return f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"

    parts = []
    for c in cols:
        mn, mx = render(c)
        parts.append(
            f"""
        SELECT '{c}' AS "column",
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {mn} AS min_value,
               {mx} AS max_value
        FROM {table}"""
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'
