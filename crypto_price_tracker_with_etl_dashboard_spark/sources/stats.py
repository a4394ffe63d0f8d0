"""File-level min/max statistics and scan-pruning estimation — the
data-skipping ledger Delta/Iceberg manifests keep, derived here
directly from the data with one distributed pass.

Why it matters at 100 TB: a selective predicate's real cost is the
number of FILES the scan must open, and that is decided by each
file's min/max envelope, not by row counts.  `file_stats` builds the
per-file envelope table (one narrow `input_file_name()` groupBy —
O(files) output); `pruning_report` replays a conjunction of range
predicates against it and reports exactly which fraction of files a
stats-aware reader opens.  Together with
`operators/zorder.py::write_zordered` this closes the loop: write
the layout, then PROVE the skipping it bought (the pytest in
test_zorder asserts z-order beats linear layout on 2-D boxes via
this report).

All raw aggregates (min/max/count per file) — no floats are
manufactured, so the report is engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file (file, n_rows, <c>_min, <c>_max ...) envelope table.
    One scan, map-side combined onto O(files) groups."""
    if not cols:
        raise ValueError("cols must be non-empty")
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def pruning_report(
    stats: DataFrame, predicates: dict[str, tuple[float, float]]
) -> DataFrame:
    """One-row report of what a stats-aware scan skips for a
    conjunction of closed-interval predicates {col: (lo, hi)}: a
    file MUST be opened iff every predicate interval intersects its
    [min, max] envelope.  Columns: n_files, n_opened, n_skipped,
    rows_total, rows_opened."""
    if not predicates:
        raise ValueError("predicates must be non-empty")
    must_open = F.lit(True)
    for c, (lo, hi) in predicates.items():
        must_open = must_open & (
            (F.col(f"{c}_max") >= F.lit(lo)) & (F.col(f"{c}_min") <= F.lit(hi))
        )
    # NULL envelope (file's column is entirely NULL) => no non-null
    # value exists, so a range predicate is unsatisfiable there:
    # SKIP, and never let the NULL leak out of both counters
    flagged = stats.select(
        "n_rows", F.coalesce(must_open, F.lit(False)).alias("__open")
    )
    return flagged.agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("__open").cast("int")).alias("n_opened"),
        F.sum((~F.col("__open")).cast("int")).alias("n_skipped"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(F.col("__open"), F.col("n_rows")).otherwise(0)).alias(
            "rows_opened"
        ),
    )
