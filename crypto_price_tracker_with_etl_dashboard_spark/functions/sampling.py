"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus is split into train/valid/test, stratified per
language or source, and capped per origin (domain, user) so no
single origin dominates.  All three must be DETERMINISTIC functions
of the row key — re-running the pipeline, changing the partition
count, or adding executors must never move a document across splits
(that silently leaks test data into training sets).

Two bucket functions, one default:

- :func:`xxhash_bucket` (the DEFAULT): xxHash64 avalanche of the
  key — correct for ANY key value or type (string doc ids, 64-bit
  ids; no overflow), engine-deterministic inside Spark.  Not
  portable to other engines, so a cross-engine oracle cannot
  reproduce its assignments.
- :func:`lcg_bucket`: a 31-bit linear congruential mix, exactly
  expressible in ANSI SQL (the DuckDB oracle runs the identical
  arithmetic via :func:`sql_lcg_bucket`).  Oracle-compat only — its
  intermediates overflow BIGINT for integer keys above ~8.3e9, so
  it must not be the production default.

Both plug into the ``hasher`` parameter of the public helpers; the
plan shape is identical — a narrow map for the split, one hash
shuffle per window for stratify/cap.

Reference parity context: the reference has no sampling surface at
all (SURVEY.md §2.11 north-star scope); these are the BASELINE.json
training-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Classic glibc LCG constants; modulus 2^31 keeps every intermediate
# below 2^63 for keys < ~8.3e9, so the same expression runs exactly
# on any BIGINT engine (no overflow, no engine-specific hash).
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648

# stratified_sample internals: rank on the full hash state (not the
# 100-bucket split grid) and quantize fractions at 1e-6 so the keep
# cutoff is exact integer arithmetic on both engines.
SAMPLE_HASH_WIDTH = LCG_M
SAMPLE_FRACTION_QUANTUM = 1_000_000


def lcg_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key.

    ``pmod`` (not ``%``) against the LCG modulus: SQL ``%`` keeps the
    dividend's sign, so a negative key would yield a NEGATIVE bucket
    — below every split threshold, silently routing all negative-key
    rows into the first split / the extra mixture copy.  pmod makes
    the range [0, buckets) for the full BIGINT key domain."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(k.cast("bigint") * LCG_A + LCG_C, F.lit(LCG_M)) % buckets


def sql_lcg_bucket(expr: str, buckets: int = 100) -> str:
    """The identical bucket arithmetic in ANSI SQL (oracle twin;
    ``(x % m + m) % m`` is the portable pmod spelling)."""
    x = f"(CAST(({expr}) AS BIGINT) * {LCG_A} + {LCG_C})"
    return f"((({x} % {LCG_M}) + {LCG_M}) % {LCG_M}) % {buckets}"


def xxhash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Production-default bucket in [0, buckets): xxHash64 avalanche,
    defined for every key value and type (strings, full-range
    BIGINTs — no LCG overflow cliff).  ``pmod`` keeps the bucket
    non-negative for negative hash values."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(k), F.lit(buckets))


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int] | None = None,
    *,
    hasher,
) -> DataFrame:
    """Tag each row with a split name by hashed-key percentile.

    ``splits`` maps name -> percentage; ranges are assigned in the
    given order (dict order is insertion order).  Default 80/10/10.
    Narrow map only — no shuffle, fully parallel at any scale.

    ``hasher`` is REQUIRED and keyword-only, deliberately: the
    module's leakage invariant is that a document never moves across
    splits once materialized, and the hasher IS the assignment.  A
    default that later changed (as r2's lcg->xxhash switch did)
    would silently reassign every caller's persisted train/valid/
    test membership.  Choose ``xxhash_bucket`` for new pipelines
    (full 64-bit avalanche, any key type) or ``lcg_bucket`` for
    SQL-portable assignments, and keep that choice for the life of
    the dataset.
    """
    splits = splits or {"train": 80, "valid": 10, "test": 10}
    # Hard ValueErrors, not assert: assert is stripped under
    # ``python -O``, and a 90%-sum split would silently NULL-tag 10%
    # of the corpus.  Percentages must be integers — the assignment
    # grid has exactly 100 buckets, so a fractional pct (99.5/0.5)
    # can never receive its share and the small split starves.
    if any(not isinstance(p, int) or p <= 0 for p in splits.values()):
        raise ValueError(f"split percentages must be positive ints: {splits}")
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = hasher(key, 100)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = bucket < F.lit(lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    fraction: float,
    *,
    hasher,
) -> DataFrame:
    """EXACT per-stratum fraction: ceil(fraction * |stratum|) rows,
    chosen deterministically by hashed-key order.

    Unlike ``df.sampleBy`` (Bernoulli — approximate counts, RNG
    seeded per-partition, so resampling moves with partitioning),
    this is reproducible under any cluster layout: one shuffle on
    the stratum key, rank by (hash, key), keep the head.

    Two exactness details:

    * the rank orders by the FULL-WIDTH hash (``hasher(key,
      SAMPLE_HASH_WIDTH)``), not the default 100-bucket grid — with
      only 100 hash values the tiebreak falls to raw key order and
      the boundary bucket is taken in lowest-id-first order, a
      systematically id-biased sample at small fractions;
    * the cutoff is integer arithmetic on a 1e-6-quantized fraction,
      not ``F.ceil`` of a float product — ``100 * 0.07`` is
      7.000000000000001 in binary floating point, so the float ceil
      keeps 8 rows where the documented ``ceil(fraction*n)`` = 7.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    fq = round(fraction * SAMPLE_FRACTION_QUANTUM)
    if fq == 0:
        raise ValueError(
            f"fraction {fraction} is below the 1e-6 quantization floor"
        )
    w = Window.partitionBy(stratum).orderBy(
        hasher(key, SAMPLE_HASH_WIDTH), F.col(key)
    )
    wc = Window.partitionBy(stratum)
    q = SAMPLE_FRACTION_QUANTUM
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") <= F.expr(f"(_n * {fq} + {q - 1}) div {q}"))
        .drop("_rn", "_n")
    )


def per_group_cap(
    df: DataFrame,
    group: str,
    order_by: list[str],
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, by a total order.

    The anti-domination primitive (max N documents per domain / max N
    events per user).  One shuffle on the group key; with the
    WindowGroupLimit physical rule (Spark >= 3.5) the per-partition
    partial limit discards rows BEFORE the exchange, so shuffle
    volume is O(groups x cap x tasks), not O(rows) — same plan
    property pinned for latest-per-key in operators/latest.py.
    """
    w = Window.partitionBy(group).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def pack_chunks(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated
    in ``order_col`` order and cut into fixed ``budget``-token
    context windows; each document learns its [start_chunk,
    end_chunk] span (a document may straddle a window boundary —
    the standard GPT-style packing semantic).

    The global running token count is computed WITHOUT a global
    sort: rows cumsum within ``order_col``-range buckets in
    parallel, bucket totals (corpus/bucket_size rows — tiny)
    prefix-sum and broadcast back as offsets.  One shuffle on the
    bucket id, never a single-partition window over the corpus.

    A 0-token document sitting exactly on a window boundary would
    get ``end_chunk = start_chunk - 1`` from the raw formula; its
    span is clamped to the empty-at-start convention
    ``[start_chunk, start_chunk]``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be positive, got {bucket_size}")
    b = F.floor(F.col(order_col) / bucket_size).cast("bigint")
    dfb = df.withColumn("_b", b)
    w_in = Window.partitionBy("_b").orderBy(order_col)
    dfb = dfb.withColumn(
        "_excl_in", F.sum(tokens_col).over(w_in) - F.col(tokens_col)
    )
    totals = dfb.groupBy("_b").agg(F.sum(tokens_col).alias("_bt"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0))
    ).select("_b", "_off")
    out = dfb.join(F.broadcast(offsets), "_b").withColumn(
        "_excl", (F.col("_excl_in") + F.col("_off")).cast("bigint")
    )
    return (
        out.withColumn("start_chunk", F.expr(f"_excl div {budget}"))
        .withColumn(
            "end_chunk",
            F.greatest(
                F.col("start_chunk"),
                F.expr(f"(_excl + {tokens_col} - 1) div {budget}"),
            ),
        )
        .drop("_b", "_excl_in", "_off", "_excl")
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    *,
    hasher: Callable[..., Column],
    default: float = 0.0,
    source_col: str = "source",
) -> DataFrame:
    """Deterministic data-mixture sampling: each source is repeated
    ``weights[source]`` epochs (LLaMA/Pile-style mixture weights) —
    ``floor(w)`` full copies of every row plus one extra copy for the
    deterministic ``frac(w)`` hash-slice of the source.  Emits the
    input columns plus ``copy_idx`` (0-based); weight-0 sources drop
    out.  Reproducible under any partitioning (pure key arithmetic,
    no RNG) and a zero-shuffle narrow map at any scale.

    Fractions are quantized to 1e-4 IN PYTHON so both engines compare
    the hash bucket against the same integer literal — no float
    thresholds in the plan.  ``hasher`` is required (same contract as
    ``hash_split``): ``lcg_bucket`` for oracle-checkable runs,
    ``xxhash_bucket`` in production."""
    n_full_col = F.lit(None).cast("int")
    thr_col = F.lit(None).cast("int")
    src = F.col(source_col)
    if default < 0:
        raise ValueError(f"negative default weight: {default}")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}")
        n_full_col = F.when(src == s, int(w)).otherwise(n_full_col)
        thr_col = F.when(src == s, round((w - int(w)) * 10_000)).otherwise(thr_col)
    n_full_col = F.coalesce(n_full_col, F.lit(int(default)))
    thr_col = F.coalesce(thr_col, F.lit(round((default - int(default)) * 10_000)))
    n = n_full_col + (hasher(key, buckets=10_000) < thr_col).cast("int")
    copies = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # explode_outer + IS NOT NULL: plain explode would infer a
    # size>0 scan filter re-evaluating the sequence (see dedup.py).
    return (
        df.select("*", F.explode_outer(copies).alias("copy_idx"))
        .filter(F.col("copy_idx").isNotNull())
    )


def sql_mixture_n_copies(
    key_expr: str,
    source_expr: str,
    weights: dict[str, float],
    default: float = 0.0,
) -> str:
    """Oracle twin of the ``mixture_sample`` copy count (same integer
    thresholds, same hash — and the same weight validation, so both
    sides reject what the other would reject)."""
    if default < 0:
        raise ValueError(f"negative default weight: {default}")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}")

    def q(s: str) -> str:
        # SQL string-literal escape: a source name containing a quote
        # ("o'reilly") must not break — or inject into — the oracle
        # text; the Spark twin compares via F.lit and needs none.
        return s.replace("'", "''")

    full_cases = " ".join(
        f"WHEN '{q(s)}' THEN {int(w)}" for s, w in weights.items()
    )
    thr_cases = " ".join(
        f"WHEN '{q(s)}' THEN {round((w - int(w)) * 10_000)}"
        for s, w in weights.items()
    )
    return (
        f"(CASE {source_expr} {full_cases} ELSE {int(default)} END"
        f" + CASE WHEN {sql_lcg_bucket(key_expr, 10_000)}"
        f" < CASE {source_expr} {thr_cases}"
        f" ELSE {round((default - int(default)) * 10_000)} END"
        f" THEN 1 ELSE 0 END)"
    )
