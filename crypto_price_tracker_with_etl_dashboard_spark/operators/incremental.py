"""Incremental aggregate maintenance: fold a delta batch into a
materialized aggregate WITHOUT rescanning the base facts.

The lambda-architecture primitive behind every "daily rollup +
today's tail" serving table: at 100 TB the base table is months of
history whose aggregate is already on disk; only the new partition
should be scanned.  Works for any ALGEBRAIC aggregate — one whose
partials merge associatively (count, sum, min, max, and anything
derived from them: mean, variance via (n, s, s2), fixed-point
money).  MEDIAN/percentiles are deliberately not offered — they are
holistic, and pretending otherwise is the classic incremental-rollup
bug; route those through sketches (approx_percentile state) instead.

The certified query (events_incremental_agg) proves the contract the
only way that matters: merge(base_agg, delta_agg) is hash-identical
to the full recompute the DuckDB oracle runs over all facts —
fixed-point sums make that equality exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import SCALE


def agg_state(facts: DataFrame, keys: list[str], value: str) -> DataFrame:
    """The mergeable partial state for (count, fixed-point sum, min,
    max) of ``value`` per key group — what a maintained rollup table
    stores."""
    return facts.filter(F.col(value).isNotNull()).groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col(value) * SCALE).cast("decimal(38,0)")).alias("s_fp"),
        F.min(value).alias("v_min"),
        F.max(value).alias("v_max"),
    )


def merge_states(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Associative merge of two state tables with the same key
    columns: union + one re-aggregate (map-side combinable; the
    shuffle carries O(groups) rows from each side, never facts)."""
    keys = [c for c in base.columns if c not in ("n", "s_fp", "v_min", "v_max")]
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s_fp").alias("s_fp"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def finalize(state: DataFrame) -> DataFrame:
    """Render the serving columns from the state: exact sum and mean
    as one double chain off the fixed-point integer."""
    return state.select(
        *[c for c in state.columns if c not in ("n", "s_fp", "v_min", "v_max")],
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("s_fp").cast("double") / SCALE, 4).alias("sum_value"),
        F.round(F.col("s_fp").cast("double") / SCALE / F.col("n"), 6).alias(
            "mean_value"
        ),
        "v_min",
        "v_max",
    )


def join_delta(
    base_l: DataFrame,
    base_r: DataFrame,
    delta_l: DataFrame,
    delta_r: DataFrame,
    on: list[str],
) -> DataFrame:
    """The NEW rows a materialized inner join gains when both inputs
    receive (insert-only) deltas — the standard IVM delta rule

        d(L |x| R) = dL |x| R  +  L |x| dR  +  dL |x| dR

    (each term hits the OLD other side; the third term pairs the
    deltas with each other exactly once).  At 100 TB the wins are the
    base |x| base term never re-running, and each delta term joining
    a day-sized batch against a keyed (ideally bucketed) base table.
    Insert-only by design: deletes/updates need retraction counts
    (negative multiplicities), which the engine's MERGE/CDC path
    (operators/merge.py) covers instead."""
    return (
        delta_l.join(base_r, on)
        .unionByName(base_l.join(delta_r, on))
        .unionByName(delta_l.join(delta_r, on))
    )


def maintained_join(
    base_l: DataFrame,
    base_r: DataFrame,
    delta_l: DataFrame,
    delta_r: DataFrame,
    on: list[str],
) -> DataFrame:
    """The maintained join state after applying one delta batch:
    old materialization (base |x| base) + :func:`join_delta`.
    Equal to (base+delta) |x| (base+delta) row-for-row — the
    certified query proves it against a full-recompute oracle."""
    return base_l.join(base_r, on).unionByName(
        join_delta(base_l, base_r, delta_l, delta_r, on)
    )
