"""Deterministic floating-point aggregation.

A distributed SUM over doubles is order-dependent (IEEE-754 addition
is not associative), so the same query can differ in the last ulp
between Spark (partial aggs in partition order) and a single-threaded
oracle — and between two runs on different cluster sizes.  Worse,
double->decimal->double round-trips are engine-specific (Spark's
Decimal.toDouble double-rounds through the unscaled long).

This engine therefore defines monetary/metric aggregates at a fixed
decimal precision (4 places by default): each term is rounded to an
integer number of 1e-4 units, accumulated exactly in DECIMAL(38,0),
and divided back once at the end.

Why this is portable bit-for-bit: rounding a double to an INTEGER
count of units only requires comparing it against k+0.5 boundaries,
which is unambiguous for any faithful representation of the value
(and both Spark's HALF_UP and DuckDB's half-away-from-zero agree on
exact ties).  The DECIMAL(38,0) sum is exact and order-independent
(a BIGINT accumulator — the original design — overflows per-term at
|x| > 9.2e14 units, i.e. price*volume products an ordinary crypto
feed actually reaches; decimal is exact to 1e38 and, under Spark's
ANSI mode, fails loudly rather than wrapping beyond that), and the
final division is one double operation.  Caveat: casting a decimal
whose unscaled value exceeds 2^63 to double goes through BigDecimal
in Spark and hugeint in DuckDB — both correctly rounded on current
JDK/DuckDB, but that last cast is the only non-integer step.

It is also the right call at 100 TB independent of any oracle:
results do not change when partitioning, AQE decisions, or executor
counts change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000  # 4 fractional decimal digits


def dsum(col: Column | str, alias: str | None = None, scale: int = SCALE) -> Column:
    """Exact fixed-point SUM, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(F.round(c * scale).cast("decimal(38,0)")).cast("double") / scale
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None, scale: int = SCALE) -> Column:
    """Exact fixed-point mean: fixed-point sum, then one double
    division by the non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(F.round(c * scale).cast("decimal(38,0)")).cast("double") / scale) / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str, scale: int = SCALE) -> str:
    return f"(CAST(SUM(CAST(round(({expr}) * {scale}) AS DECIMAL(38,0))) AS DOUBLE) / {scale})"


def sql_davg(expr: str, scale: int = SCALE) -> str:
    return (
        f"((CAST(SUM(CAST(round(({expr}) * {scale}) AS DECIMAL(38,0))) AS DOUBLE) / {scale})"
        f" / COUNT({expr}))"
    )
