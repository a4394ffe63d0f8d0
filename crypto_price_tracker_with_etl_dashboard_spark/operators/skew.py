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

Both transforms are deterministic (hash-based salt, no rand()):
results are reproducible across retries and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    real keys.  The salt is a deterministic hash of the whole row, so
    rows of one group distribute uniformly without rand()'s
    retry-nondeterminism.
    """
    for _, fn, _ in aggs:
        if fn not in _MERGE:
            raise ValueError(f"unsupported agg {fn!r}: need one of {sorted(_MERGE)}")
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select("*", salt)
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
    """
    s = skewed.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(b, [on, "__salt"], how).drop("__salt")
