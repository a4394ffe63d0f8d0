"""Bucketed tables: pre-shuffle a fact table ONCE at write time so
every later join/aggregation on the bucket key runs shuffle-free.

At 100 TB the dominant cost of a fact-fact join (e.g. orders x
lineitem on orderkey) is shuffling both sides; writing both tables
bucketed on the join key with the same bucket count moves that
shuffle to write time — each join then reads co-located buckets and
sort-merges them directly.  `tests/test_bucketing.py` pins the
no-Exchange plan.

Spark specifics: bucketing requires the table catalog (`saveAsTable`
— a plain `.parquet(path)` write silently drops bucket metadata), and
`spark.sql.sources.bucketing.enabled` (default true) at read time.
Bucket count is fixed at write: pick it for target-scale parallelism
(e.g. 100 TB / 128 MB ~ 800k splits -> thousands of buckets), not for
the test corpus.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _orphaned_location(spark: SparkSession, table: str) -> str | None:
    """Local filesystem path a managed ``table`` would occupy, or None
    when the warehouse isn't local.  Needed because the default
    in-memory catalog forgets tables at session end while their
    warehouse directories persist — the next session's CREATE then
    fails with LOCATION_ALREADY_EXISTS unless the orphan is removed."""
    if "." in table:
        db, name = table.rsplit(".", 1)
    else:
        db, name = spark.catalog.currentDatabase(), table
    try:
        loc = spark.catalog.getDatabase(db).locationUri
    except Exception:
        return None
    p = urlparse(loc)
    if p.scheme not in ("", "file"):
        return None
    return os.path.join(p.path or loc, name.lower())


# Marker dropped into every directory this module writes; orphan
# cleanup only ever deletes directories carrying it.
_MARKER = "_spark_graft_bucketed"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table hash-bucketed (and per-bucket
    sorted, for sort-merge-ready reads) on ``bucket_col``.

    Orphan cleanup (a previous session's in-memory catalog forgot
    the table but its warehouse directory persists) removes ONLY
    directories carrying this module's marker file: an unmarked
    directory at the location was never written here — deleting it
    would destroy someone else's data, so the write is left to fail
    loudly with LOCATION_ALREADY_EXISTS instead."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        path = _orphaned_location(spark, table)
        if path and os.path.exists(path):
            if os.path.exists(os.path.join(path, _MARKER)):
                shutil.rmtree(path)  # our own stale dir from a dead session
            # else: not ours — let saveAsTable raise on the collision
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
    path = _orphaned_location(spark, table)
    if path and os.path.isdir(path):
        with open(os.path.join(path, _MARKER), "w") as f:
            f.write("written by operators/bucketing.py; safe to clean up\n")


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    matching bucketing Spark plans a sort-merge join with ZERO
    Exchange operators — the co-location was paid at write time."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on, how)
