"""Streaming CDC apply: a change stream (I/U/D rows with a sequence
column) continuously merged into a materialized parquet table — the
streaming twin of ``operators/merge.py::merge_upsert`` (certified as
the ``orders_merge_upsert`` oracle row; this module adds the
delivery machinery, value-identical per batch).

Exactly-once without a transaction log: parquet overwrite is not
atomic, so each micro-batch writes a FULL new table version to its
own directory ``v=<batch_id>`` and then commits by atomically
renaming a pointer file (``_LATEST.tmp`` -> ``_LATEST``).  The
commit-last ordering is what makes at-least-once foreachBatch
exactly-once at the table level:

- crash BEFORE the pointer rename: the pointer still names the last
  committed version; the replayed batch re-reads that same base and
  deterministically rewrites ``v=<batch_id>`` (same input, same
  merge — idempotent).
- crash AFTER the rename: the batch is fully committed; the replay
  rewrites byte-identical output and re-renames harmlessly.

Readers (``read_cdc_table``) go through the pointer, so they never
observe a partial version.  This is exactly the miniature of what a
table format (Delta/Iceberg) provides; at 100 TB the full-rewrite
per batch becomes copy-on-write per PARTITION — swap the version
write for dynamic partition overwrite keyed by the merge keys'
partitions and keep the same pointer commit.

Old versions accumulate (time travel for free); ``prune_versions``
drops everything but the newest K, never the pointed-at one.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from crypto_price_tracker_with_etl_dashboard_spark.operators.merge import merge_upsert

_POINTER = "_LATEST"


def _commit_pointer(table_dir: str, version: int) -> None:
    tmp = os.path.join(table_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, _POINTER))  # atomic commit


def current_version(table_dir: str) -> int | None:
    try:
        with open(os.path.join(table_dir, _POINTER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def read_cdc_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """The committed table state, or None before the first commit."""
    v = current_version(table_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def prune_versions(table_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions (the pointed-at
    version is always kept).  Returns the pruned version numbers."""
    cur = current_version(table_dir)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    doomed = [v for v in versions[:-keep] if v != cur] if keep else []
    for v in doomed:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
    return doomed


def run_cdc_apply(
    spark: SparkSession,
    updates_stream: DataFrame,
    table_dir: str,
    key: str,
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "seq",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Start the apply loop: each micro-batch of change rows (full
    payload + op + seq) merges into the committed version and
    commits the result as the next version."""
    os.makedirs(table_dir, exist_ok=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        base = read_cdc_table(spark, table_dir)
        changes = batch_df.drop(op_col, seq_col)
        if base is None:
            # bootstrap: the first batch's non-deletes ARE the table
            # (still keep-last resolved per key, like every batch)
            base = changes.limit(0)
        merged = merge_upsert(
            base, batch_df, key, op_col=op_col, seq_col=seq_col
        )
        out = os.path.join(table_dir, f"v={batch_id}")
        merged.write.mode("overwrite").parquet(out)
        _commit_pointer(table_dir, batch_id)

    writer = updates_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
