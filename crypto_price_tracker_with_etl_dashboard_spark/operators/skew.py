"""Skew mitigation: salted two-stage aggregation and salted
replicated joins.

First line of defense is AQE (session.py turns on
`spark.sql.adaptive.skewJoin.enabled`), which splits oversized
sort-merge partitions at runtime.  Salting is the explicit fallback
for the cases AQE does not cover:

  * hash AGGREGATION on a hot key — AQE cannot split a single group;
    a key holding 10% of a 100 TB table lands 10 TB on one reducer.
    `salted_agg` splits each group into ``n_salts`` sub-groups
    (map-side partials still apply), then re-aggregates the tiny
    per-salt results.
  * a shuffle JOIN whose hot key defeats partitioning and whose build
    side is too big to broadcast. `salted_join` salts the big side
    deterministically and replicates each build-side row to every
    salt — state grows by ``n_salts`` x |build|, so use it only when
    the build side is modest and broadcast is impossible.

Salt assignment: ``pmod(hash(monotonically_increasing_id()), n)``.
The earlier design hashed the whole row, which was deterministic but
broke exactly where salting matters — a hot key made of IDENTICAL
repeated rows (the classic skew shape: millions of equal events) all
hashed to ONE salt and still landed on one reducer; it also crashed
outright on tables with MapType columns (F.hash rejects maps).  The
row-position hash spreads equal rows uniformly.  A task retry may
assign different salts than the failed attempt — harmless by
construction: any salt assignment yields the same final result
(stage-2 re-merges all salts of a group; the build side is
replicated to every salt), and a retried task recomputes its whole
partition's shuffle output atomically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))

# Algebraic aggregates that re-aggregate cleanly: final(partial) per salt.
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` — (column, fn, alias) with fn in {sum, count, min, max}.
    Stage 1 groups on (keys..., salt) — a hot key spreads over
    ``n_salts`` reducers; stage 2 merges the per-salt partials on the
    real keys.  Salt is a row-position hash (module docstring): equal
    rows spread uniformly, and any assignment re-merges identically.
    """
    for _, fn, _ in aggs:
        if fn not in _MERGE:
            raise ValueError(f"unsupported agg {fn!r}: need one of {sorted(_MERGE)}")
    partial = (
        df.select("*", _salt(n_salts).alias("__salt"))
        .groupBy(*keys, "__salt")
        .agg(*[_MERGE[fn][0](c).alias(f"__p_{alias}") for c, fn, alias in aggs])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn][1](f"__p_{alias}").alias(alias) for _, fn, alias in aggs]
    )


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed large side against a modest build side that
    cannot be broadcast: salt the skewed rows into ``n_salts``
    sub-keys and replicate every build row once per salt, so a hot
    key's rows spread over ``n_salts`` shuffle partitions instead of
    one.  Join cost: |skewed| + n_salts x |build| shuffled rows.

    ``how`` is restricted to join types that preserve only the
    SKEWED side: the build side is replicated per salt, so a
    right/full outer join would emit every unmatched build row
    ``n_salts`` times (once per unmatched copy).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports only skewed-side-preserving joins "
            f"{sorted(allowed)}, got {how!r} (build rows are replicated "
            f"n_salts times, so outer-preserving the build side would "
            f"duplicate its unmatched rows)"
        )
    s = skewed.withColumn("__salt", _salt(n_salts))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(b, [on, "__salt"], how).drop("__salt")
