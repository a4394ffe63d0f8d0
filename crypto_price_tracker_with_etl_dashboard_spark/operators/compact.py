"""Small-file compaction for the append-stream table (SURVEY.md
section 7 M6): the reference appends ~100 rows every 5 minutes
(etl/crypto_etl.py:19,157), which at 100 TB scale degenerates into a
classic small-files workload — thousands of KB-sized parquet files
per date partition, each costing a task + an open + a footer read.

``compact_parquet`` rewrites a (partitioned) parquet directory into
~target-sized files, preserving the partition layout so partition
pruning keeps working.  It is an offline maintenance pass: run it on
closed (past-date) partitions while the stream keeps appending to the
current one — date partitions make the two disjoint, so no
coordination is needed.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(total_bytes: int, target_file_bytes: int) -> int:
    """Number of output files for a partition of ``total_bytes``."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = "dt",
) -> dict:
    """Rewrite ``src_dir`` parquet into ``dst_dir`` with ~target-sized
    files.  Partitioned layout: each partition directory is compacted
    independently (sized by its own bytes) and rewritten with the same
    ``partition_col=value`` path, so readers prune exactly as before.

    Local-filesystem implementation (os.walk for sizes); on a cluster
    the same logic runs against the Hadoop FileSystem API.  Returns
    {files_before, files_after, bytes}.
    """

    def _file_count(path: str) -> int:
        return sum(
            1
            for root, _d, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    before = _file_count(src_dir)
    total = 0
    if partition_col is not None:
        parts = sorted(
            d for d in os.listdir(src_dir) if d.startswith(f"{partition_col}=")
        )
    else:
        parts = []
    if parts:
        for p in parts:
            src_p = os.path.join(src_dir, p)
            n_bytes = _dir_bytes(src_p)
            total += n_bytes
            n = plan_file_count(n_bytes, target_file_bytes)
            (
                spark.read.parquet(src_p)
                .coalesce(n)
                .write.mode("overwrite")
                .parquet(os.path.join(dst_dir, p))
            )
    else:
        total = _dir_bytes(src_dir)
        n = plan_file_count(total, target_file_bytes)
        spark.read.parquet(src_dir).coalesce(n).write.mode("overwrite").parquet(dst_dir)
    return {
        "files_before": before,
        "files_after": _file_count(dst_dir),
        "bytes": total,
    }
