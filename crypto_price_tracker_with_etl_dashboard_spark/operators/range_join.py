"""Bucketed range (interval) join.

``left.ts BETWEEN right.start AND right.end`` is a non-equi
condition; Catalyst's only generic strategy for it is a (broadcast)
nested-loop join — O(|left| x |right|) comparisons, hopeless at
100 TB.  The scale-correct plan quantizes time into fixed buckets:
every interval explodes into the buckets it covers, every event maps
to exactly one bucket, and the join becomes an EQUI join on
(key, bucket) with the precise range predicate left as a residual
filter.  Work becomes O(|left| + |right| x avg_buckets_per_interval
+ |matches|), shuffled once on the bucket key — the same idea as
interval trees, flattened into hash partitioning.

Bucket width trades replication for selectivity: ~the median
interval length is a good default (each interval lands in 1-2
buckets; each bucket pairs only co-bucketed rows).

Reference parity context: the reference has no range join (its only
join is J1, api/server.js:67-77); this is engine-surface breadth for
the time-series workloads the prices model implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point ``ts_col``) to right rows (interval
    [``start_col``, ``end_col``), end-exclusive) via bucket
    quantization + residual filter.

    ``extra_on`` adds an equi-term (e.g. a shared key) to the bucket
    join.  Column names must be disjoint between the two sides
    except those referenced by ``extra_on``.

    ``how``: 'inner' or 'left' only.  The range predicate is folded
    INTO the join condition (not applied as a post-filter): a
    post-filter would evaluate NULL on a left join's unmatched rows
    and silently drop them, degrading 'left' to inner.  Right/full
    outer are rejected: the bucket explosion replicates each interval
    row once per covered bucket, so an unmatched right row would
    surface once per replica — quantization is not transparent for
    right-side preservation.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"how={how!r} unsupported: bucket replication of the interval side "
            "breaks right/full-outer row preservation (use 'inner' or 'left')"
        )
    if bucket_seconds <= 0:
        # non-ANSI Spark would turn the divide-by-zero into NULL
        # buckets and a silently EMPTY join
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    ts_bucket = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("bigint")
    start_b = (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("bigint")
    # end-exclusive: an interval ending exactly on a bucket boundary
    # does not cover that bucket.  The last covered SECOND must be
    # computed at microsecond precision — unix_timestamp() truncates
    # sub-second ends, so `unix_timestamp(end) - 1` on an interval
    # ending at 10:00:00.500 would stop the replication one bucket
    # short and the join would silently miss events in (10:00:00,
    # 10:00:00.500).  (unix_micros - 1) div 1e6 is exact int64
    # arithmetic: integer-second ends exclude their boundary second,
    # fractional ends include it.
    end_b = F.expr(
        f"((unix_micros({end_col}) - 1) div 1000000) div {bucket_seconds}"
    )

    l = left.withColumn("__bkt", ts_bucket)
    # explode_outer (not explode): a plain explode of the computed
    # sequence would get an inferred size>0 filter pushed into the
    # scan re-evaluating it (see SCALE.md pitfalls)
    r = (
        right.withColumn(
            "__bkt", F.explode_outer(F.sequence(start_b, F.greatest(end_b, start_b)))
        )
        .filter(F.col("__bkt").isNotNull())
    )
    cond = F.col("l.__bkt") == F.col("r.__bkt")
    if extra_on is not None:
        cond = cond & extra_on
    residual = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    out = l.alias("l").join(r.alias("r"), cond & residual, how)
    return out.drop("__bkt")
