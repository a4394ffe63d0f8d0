"""Write-Audit-Publish: stage a table version, run audits against
the STAGED data, and only then atomically flip the readers' pointer.

The production-data pattern behind "bad data never goes live": a
pipeline writes its output to a staging version directory, a battery
of audit checks (row counts, null rates, referential integrity,
freshness — any callable DataFrame -> violation count) runs against
that staging copy, and the atomic pointer rename from
``streaming/cdc.py`` publishes it only if every audit passes.  A
failed audit leaves the previous published version untouched and the
staging directory in place for debugging — the failure mode is
"yesterday's data", never "half of today's".

This intentionally reuses the CDC table layout (``v=N`` version
directories + the ``_LATEST`` pointer file), so WAP-published and
stream-maintained tables are interchangeable to readers
(``streaming/cdc.py::read_cdc_table``).

At 100 TB nothing here changes shape: the stage write is the
pipeline's own (partitioned) write, audits are ordinary Spark jobs
over the staged parquet, and publish is one metadata rename.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_price_tracker_with_etl_dashboard_spark.streaming.cdc import (
    _commit_pointer,
    current_version,
)


class AuditFailure(Exception):
    """Raised when an audit reports violations; carries the per-audit
    violation counts so the caller can alert with specifics."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(f"WAP audits failed: {violations}")


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    audits: dict[str, Callable[[DataFrame], int]],
    spark: SparkSession | None = None,
) -> int:
    """Stage ``df`` as the next version of ``table_dir``, audit the
    STAGED parquet (not the in-memory frame — what was written is
    what gets checked), publish on success.  Returns the published
    version.  Raises :class:`AuditFailure` (pointer untouched,
    staging retained) if any audit returns a nonzero violation
    count.
    """
    spark = spark or df.sparkSession
    prev = current_version(table_dir)
    version = 0 if prev is None else prev + 1
    staged = os.path.join(table_dir, f"v={version}")
    df.write.mode("overwrite").parquet(staged)
    staged_df = spark.read.parquet(staged)
    violations = {
        name: int(check(staged_df)) for name, check in audits.items()
    }
    bad = {n: v for n, v in violations.items() if v != 0}
    if bad:
        raise AuditFailure(bad)
    _commit_pointer(table_dir, version)
    return version


# ---- stock audits -----------------------------------------------------------

def audit_min_rows(n: int) -> Callable[[DataFrame], int]:
    """Violation iff the staged table has fewer than ``n`` rows (the
    empty-output guard every pipeline wants)."""
    def check(df: DataFrame) -> int:
        return 1 if df.count() < n else 0

    return check


def audit_no_nulls(*cols: str) -> Callable[[DataFrame], int]:
    """Violations = rows where any of ``cols`` is NULL."""
    if not cols:
        raise ValueError("audit_no_nulls needs at least one column")

    def check(df: DataFrame) -> int:
        from pyspark.sql import functions as F

        pred = None
        for c in cols:
            p = F.col(c).isNull()
            pred = p if pred is None else (pred | p)
        return df.filter(pred).count()

    return check


def audit_unique_key(*cols: str) -> Callable[[DataFrame], int]:
    """Violations = rows beyond the first within any duplicate key
    group (0 iff ``cols`` is a unique key of the staged table)."""
    def check(df: DataFrame) -> int:
        from pyspark.sql import functions as F

        return (
            df.groupBy(*cols)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("v"))
            .collect()[0]["v"]
        )

    return check
