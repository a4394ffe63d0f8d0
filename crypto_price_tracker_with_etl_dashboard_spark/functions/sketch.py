"""Count-min sketch over a key column (Cormode & Muthukrishnan,
J.Algorithms 2005): a depth x width grid of counters; each key
increments one counter per row (row j at column md5-hash_j(key) mod
width), and a key's frequency estimate is the MIN over its depth
counters — always an OVERestimate (collisions only add).

Why a sketch in an engine that can count exactly: at 100 TB the
exact per-key counts are themselves corpus-sized state (billions of
distinct keys), while the sketch is a CONSTANT depth*width cells no
matter the key cardinality.  The update stream is a map-side
combinable hash aggregate onto depth*width groups, so the shuffle
carries ~depth*width rows per task regardless of input size, and the
finished sketch broadcasts anywhere a frequency estimate is needed
(heavy-hitter screens, skew detection before a join, sampling-rate
decisions).

Everything is integer arithmetic on md5 prefixes — the same
engine-portable hash family as functions/dedup.py (md5 hex -> BIGINT
via a 15-hex-digit prefix, 60 bits, exactly representable
everywhere), so a DuckDB oracle reproduces the sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(md5_col: Column, j: int, width: int) -> Column:
    """Row-j column index: the j-th disjoint 8-hex-digit (32-bit)
    slice of ONE md5 of the key, mod width.  Hashing the key once and
    slicing — instead of d independent md5('j:key') calls — quarters
    the per-row hash cost at depth 4 (measured 8.7s -> linear-band at
    sf1), and the slices of a cryptographic digest are independent
    uniform 32-bit values, which is all CMS rows need.  Requires
    depth * 8 <= 32 hex digits, i.e. depth <= 4.  Mirrors the
    oracle's ``('0x' || substr(md5(k), 1+8j, 8))::BIGINT % width``."""
    h = F.conv(F.substring(md5_col, 1 + 8 * j, 8), 16, 10).cast("bigint")
    return (h % width).alias(f"b{j}")


def sql_bucket(key_expr: str, j: int, width: int) -> str:
    """DuckDB twin of :func:`_bucket` (same single-md5 slicing)."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), {1 + 8 * j}, 8))"
        f"::BIGINT % {width})"
    )


def _cells(df: DataFrame, key: str, depth: int, width: int) -> DataFrame:
    """(j, bucket) cell stream: one md5 per row, exploded into the
    depth (row, column) coordinates it increments."""
    if depth > 4:
        raise ValueError(f"md5 slicing supports depth <= 4, got {depth}")
    hashed = df.select(F.md5(F.col(key).cast("string")).alias("__h"))
    return hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("__h"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.j", "cell.bucket")


def cms_build(df: DataFrame, key: str, depth: int = 4, width: int = 256) -> DataFrame:
    """The (j, bucket, cnt) counter table: one pass over ``df``, each
    row exploded into its ``depth`` (row, column) cells, then ONE
    hash aggregate onto at most depth*width groups (map-side partials
    collapse each task's contribution to <= depth*width rows before
    the exchange — the shuffle is constant-size in the input)."""
    return _cells(df, key, depth, width).groupBy("j", "bucket").agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Frequency estimate per key in ``keys``: min over the depth
    counters the key hashes to.  The sketch (<= depth*width rows)
    broadcasts; the keys side explodes depth cells per key and
    re-aggregates on the key — O(|keys|) work, no corpus scan."""
    if depth > 4:
        raise ValueError(f"md5 slicing supports depth <= 4, got {depth}")
    probes = keys.select(
        F.col(key), F.md5(F.col(key).cast("string")).alias("__h")
    ).select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("__h"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key, "cell.j", "cell.bucket")
    # LEFT join + coalesce-to-0: a (j, bucket) cell NO row ever
    # incremented is absent from the counter table, and its true
    # counter value is 0 — an inner join would silently drop that
    # probe and take the min over the remaining (non-zero) cells,
    # overestimating a never-inserted key instead of answering 0.
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge counter tables built with the SAME (depth, width): CMS
    is linear, so the merged sketch is the cell-wise sum — the
    property that makes it distributable (per-partition/per-day/
    per-source sketches combine without revisiting any input) and
    streamable (each micro-batch contributes a sketch; the running
    state is the sum).  Estimates from the merged sketch are exactly
    the estimates of the concatenated inputs."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def streaming_cms(stream: DataFrame, key: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Streaming count-min sketch: because the sketch IS a group-by
    count over (j, bucket) cells, Structured Streaming maintains it
    natively as an update-mode aggregation — no custom state
    operator needed, and the running sketch equals ``cms_build`` over
    everything ingested so far (linearity; asserted in
    test_streaming).  State is bounded by depth*width rows FOREVER —
    the rare streaming aggregation that needs no watermark to stay
    bounded.  Probe the latest snapshot with :func:`cms_estimate`."""
    return _cells(stream, key, depth, width).groupBy("j", "bucket").agg(
        F.count("*").alias("cnt")
    )


def streaming_histogram(
    stream: DataFrame,
    value: str,
    lo: float,
    hi: float,
    n_buckets: int = 16,
) -> DataFrame:
    """Streaming fixed-width histogram with CALLER-SUPPLIED bounds:
    the batch histogram's first pass (global min/max) cannot exist on
    an unbounded stream, so the bounds are part of the operator
    contract here — values outside [lo, hi) clamp into the edge
    buckets, and the bucket expression is otherwise identical to the
    certified ``events_histogram``.  Like :func:`streaming_cms`, the
    running state is a plain update-mode aggregation bounded by
    n_buckets rows forever — no watermark needed."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got {lo}, {hi}")
    width = (hi - lo) / n_buckets
    bucket = F.greatest(
        F.least(
            F.floor((F.col(value) - F.lit(lo)) / F.lit(width)),
            F.lit(n_buckets - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    return (
        stream.filter(F.col(value).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# ---- Bloom filter -----------------------------------------------------------
# The membership sibling of the CMS: k md5-slice bit positions per
# key over an m-bit space, materialized as the DISTINCT set-bit
# table (O(min(n*k, m)) rows — broadcast-sized by construction).
# Membership = all k positions present, evaluated as k chained
# BROADCAST LEFT-SEMI joins, so the probe relation never shuffles at
# all — the semi-join prefilter shape Spark's own runtime bloom
# (spark.sql.optimizer.runtime.bloomFilter.enabled) injects, here as
# an explicit engine-portable operator a DuckDB oracle reproduces
# bit-for-bit.  No false negatives ever; false positives are the
# (1 - e^(-kn/m))^k textbook rate, surfaced by the certified query.


def bloom_bits(df: DataFrame, key: str, k: int = 4, m: int = 4096) -> DataFrame:
    """The set-bit table: DISTINCT md5-slice positions of every key.
    One map + one distinct agg onto <= m groups (map-side combined)."""
    if k > 4:
        raise ValueError(f"md5 slicing supports k <= 4, got {k}")
    hashed = df.select(F.md5(F.col(key).cast("string")).alias("__h"))
    return (
        hashed.select(
            F.explode(
                F.array(*[_bucket(F.col("__h"), j, m) for j in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_semi_filter(
    probe: DataFrame, key: str, bits: DataFrame, k: int = 4, m: int = 4096
) -> DataFrame:
    """Rows of ``probe`` whose key passes the filter (all k bit
    positions set).  k broadcast left-semi joins — zero shuffle on
    the probe side; output schema == probe schema."""
    if k > 4:
        raise ValueError(f"md5 slicing supports k <= 4, got {k}")
    h = F.md5(F.col(key).cast("string"))
    out = probe
    for j in range(k):
        out = out.withColumn(f"__bb{j}", _bucket(h, j, m))
    for j in range(k):
        out = out.join(
            F.broadcast(bits.select(F.col("bit").alias(f"__set{j}"))),
            F.col(f"__bb{j}") == F.col(f"__set{j}"),
            "left_semi",
        )
    return out.drop(*[f"__bb{j}" for j in range(k)])
