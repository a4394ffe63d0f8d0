"""Z-order (Morton) data layout: interleave the bits of two key
columns so range filters on EITHER key map to a bounded number of
code ranges — the data-skipping lever (Delta OPTIMIZE ZORDER,
Iceberg sort orders) that at 100 TB decides whether a selective scan
reads 100 files or 100,000.

Two pieces:

- ``morton_code``: the pure bit-arithmetic column expression (JVM
  codegen, zero shuffle; the DuckDB oracle evaluates the identical
  integer formula, so codes certify exactly).
- ``write_zordered``: range-partition by the code and sort within
  partitions before writing — parquet row-group/file min-max stats
  then cover tight, mostly disjoint code ranges, which is what makes
  the engine's scan pruning effective on both constituent keys.

Scale notes: ``repartitionByRange`` samples the code distribution
(one pass) and produces balanced output files regardless of key
skew; the sort is per-partition, never global.  Codes use the LOW
``bits`` of each key — pre-scale or hash keys wider than the budget
(the standard practice; locality only needs relative order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two NONNEGATIVE integer
    columns: x occupies even result bits, y odd.  2*bits <= 62."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = F.col(x).cast("bigint") if isinstance(x, str) else x.cast("bigint")
    yc = F.col(y).cast("bigint") if isinstance(y, str) else y.cast("bigint")
    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        acc = acc + F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b)
        acc = acc + F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return acc


def sql_morton(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of morton_code over the same integer formula."""
    terms = []
    for b in range(bits):
        # CAST before shifting: DuckDB shifts INTEGER in 32 bits and
        # overflows at << 31 instead of widening
        terms.append(f"(CAST((({x_expr}) >> {b}) & 1 AS BIGINT) << {2 * b})")
        terms.append(f"(CAST((({y_expr}) >> {b}) & 1 AS BIGINT) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    x: str,
    y: str,
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out in z-order over (x, y):
    range-partitioned into ~n_files by the interleaved code, sorted
    within each partition so row-group min-max stats are tight."""
    z = morton_code(x, y, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
