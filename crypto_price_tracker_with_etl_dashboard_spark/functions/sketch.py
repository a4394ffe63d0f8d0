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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007)
# ---------------------------------------------------------------------------
# The mergeable counterpart of approx_count_distinct: CMS answers
# "how often", Bloom answers "ever seen", HLL answers "how many
# distinct" — in HLL_M registers TOTAL no matter the key cardinality,
# and two sketches over disjoint (or overlapping!) partitions of the
# data merge by register-wise MAX.  That merge is what the built-in
# approx_count_distinct cannot expose as data: at 100 TB you sketch
# once per day/partition, persist HLL_M tiny rows, and answer any
# later union-cardinality question (month? quarter? two overlapping
# segments?) without rescanning the corpus.
#
# Engine-portable hashing: the same single-md5 32-bit slice the CMS
# above uses (cryptographic avalanche; DuckDB's md5() matches
# Spark's byte-for-byte on the string-cast key).  A cheap LCG-style
# arithmetic mix is NOT enough here: any affine map of the key is
# equidistributed rather than random, which wrecks the geometric
# leading-zero distribution rho depends on (measured +84% bias on
# sequential ids before this was switched to md5).
# Register index = the hash's low HLL_P bits; rho = leading-zero
# count of the remaining HLL_W bits + 1, computed by an explicit
# power-of-two comparison chain (exact on both engines; log2 /
# bit_length float or builtin variants are not portability-safe at
# boundaries).
#
# Estimator determinism: every register term 2^-rho is an exact
# dyadic double in [2^-(HLL_W+1), 1]; the harmonic sum of HLL_M such
# terms spans < 53 bits, so EVERY partial sum is exactly
# representable and the sum is order-invariant — safe under any
# shuffle/aggregation order.  The final alpha*m^2/Z chain is two IEEE
# ops.  The small-range linear-counting branch (m*ln(m/V)) is
# deliberately OMITTED: ln() is not correctly-rounded-guaranteed
# across libms, and the raw estimator is the regime that matters at
# scale (documented bias below ~2.5*m distincts is the trade).

HLL_P = 6            # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 32 - HLL_P   # 26-bit rho window
HLL_ALPHA = 0.709    # alpha_64 = 0.7213 / (1 + 1.079/64), 3 sig figs


def hll_hash(key: Column | str) -> Column:
    """Uniform 32-bit hash of the key: first 8 hex digits of md5 of
    the string-cast key (the CMS slice, j = 0)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(k.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def sql_hll_hash(key_expr: str) -> str:
    """DuckDB twin of :func:`hll_hash`."""
    return f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT)"


def hll_rho(w: Column) -> Column:
    """rho = position of the first set bit from the top of the
    HLL_W-bit window (1-based), HLL_W+1 for an all-zero window — an
    explicit comparison chain, exact on any engine.  Checked widest
    threshold FIRST: when-chains are first-match-wins."""
    out = None
    for r in range(1, HLL_W + 1):  # r = rho value; w >= 2^(HLL_W - r)
        cond = w >= F.lit(1 << (HLL_W - r))
        out = F.when(cond, r) if out is None else out.when(cond, r)
    return out.otherwise(F.lit(HLL_W + 1))


def sql_hll_rho(w_expr: str) -> str:
    """DuckDB twin of :func:`hll_rho` (same first-match CASE chain)."""
    whens = "".join(
        f" WHEN {w_expr} >= {1 << (HLL_W - r)} THEN {r}"
        for r in range(1, HLL_W + 1)
    )
    return f"(CASE{whens} ELSE {HLL_W + 1} END)"


def hll_registers(df: DataFrame, key: str, *groups: str) -> DataFrame:
    """Per-``groups`` HLL sketch: one row per (groups..., bucket) with
    the max-rho register value.  Map-side combinable — the shuffle
    carries at most |groups| * HLL_M rows per task."""
    h = hll_hash(key)
    bucket = F.pmod(h, F.lit(HLL_M)).alias("bucket")
    w = (h / F.lit(HLL_M)).cast("bigint")
    return (
        df.filter(F.col(key).isNotNull())
        .select(*groups, bucket, hll_rho(w).alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge_estimate(registers: DataFrame) -> DataFrame:
    """Merge per-group sketches (register-wise MAX across ALL groups)
    and return a one-row estimate: alpha * m^2 / (sum 2^-rho over the
    m registers, empty registers contributing 2^0 = 1)."""
    merged = registers.groupBy("bucket").agg(F.max("max_rho").alias("rho"))
    z_present = F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("rho")))
    return merged.agg(
        z_present.alias("__zp"), F.count("*").alias("__filled")
    ).select(
        F.floor(
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            / (F.col("__zp") + (F.lit(HLL_M) - F.col("__filled")))
        )
        .cast("bigint")
        .alias("n_estimate"),
        F.col("__filled").cast("bigint").alias("registers_filled"),
    )


def sql_hll_estimate(key_expr: str, table: str, group_expr: str) -> str:
    """DuckDB twin of the full per-group-sketch -> merge -> estimate
    pipeline: CTEs ``regs`` (per-group registers) and a one-row
    SELECT (n_estimate, registers_filled).  Compose into a WITH."""
    h = sql_hll_hash(key_expr)
    return f"""
    regs AS (
      SELECT {group_expr} AS grp, ({h}) % {HLL_M} AS bucket,
             MAX({sql_hll_rho(f"(({h}) // {HLL_M})")}) AS max_rho
      FROM {table} WHERE {key_expr} IS NOT NULL
      GROUP BY 1, 2
    ),
    merged AS (
      SELECT bucket, MAX(max_rho) AS rho FROM regs GROUP BY bucket
    ),
    est AS (
      SELECT CAST(floor({HLL_ALPHA * HLL_M * HLL_M}
                        / (SUM(1.0 / (CAST(1 AS BIGINT) << rho))
                           + ({HLL_M} - COUNT(*)))) AS BIGINT) AS n_estimate,
             CAST(COUNT(*) AS BIGINT) AS registers_filled
      FROM merged
    )"""


def streaming_hll(stream: DataFrame, key: str) -> DataFrame:
    """Streaming HyperLogLog: the register table is a MAX-aggregate
    over the bucket key, which Structured Streaming maintains
    natively as an update/complete-mode aggregation — no custom
    state operator, and (max being associative + commutative +
    idempotent) the running snapshot equals :func:`hll_registers`
    over everything ingested so far, REGARDLESS of micro-batch
    boundaries or replays (asserted in test_streaming).  State is
    bounded by HLL_M rows FOREVER — like :func:`streaming_cms`, a
    streaming aggregation that needs no watermark to stay bounded;
    idempotence additionally makes it immune to at-least-once
    duplicate delivery, which the CMS (a counting sketch) is not.
    Estimate the latest snapshot with :func:`hll_merge_estimate`."""
    return hll_registers(stream, key)
