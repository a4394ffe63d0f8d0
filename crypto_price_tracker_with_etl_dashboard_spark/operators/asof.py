"""As-of (backward) join: for each left row, the latest right row at
or before the left row's event time, per key.

The reference has no as-of join (its only join is the
greatest-per-group self-join, api/server.js:67-77), but any consumer
of its time-series `prices` table that correlates two streams (e.g.
trades against the latest quote) needs one — and Spark has no native
ASOF JOIN, so this is a custom operator.

Implementation — union + running last_value, NOT a range join:

    1. tag right rows (quotes) 0, left rows (trades) 1
    2. union, hash-shuffle ONCE on the key
    3. per key, sort by (ts, tag) and take the running
       last non-null right-side value (ROWS UNBOUNDED PRECEDING)
    4. keep only left rows

Scale: exactly one shuffle of |left| + |right| rows on the join key —
the same cost as a regular equi-join of the two inputs.  The naive
alternative (range join `l.ts >= r.ts` + greatest-per-group) is a
quadratic blow-up per key, which a 100 TB trades table does not
survive.  Sort within partitions is Spark's window sort (spillable).
Equal-timestamp right rows must be pre-deduplicated by the caller to
make "the" as-of value well-defined (this operator joins ties
deterministically only if (key, ts) is unique on the right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value_cols: list[str],
    right_ts_alias: str = "right_ts",
) -> DataFrame:
    """Backward as-of LEFT join.

    ``left``  — rows to enrich; keeps all its columns.
    ``right`` — (on, ts, *right_value_cols); (on, ts) must be unique.
    Each output row = a left row + the right row with the greatest
    ``ts`` <= the left ``ts`` for the same ``on`` key (nulls when no
    such row), plus that matched timestamp as ``right_ts_alias``.
    """
    overlap = set([right_ts_alias, *right_value_cols, "__r", "__tag"]) & set(
        left.columns
    )
    if overlap:
        # unionByName would silently fold left values into the right
        # fill columns — each left row would "as-of" to itself.
        raise ValueError(
            f"left columns collide with as-of output columns: {sorted(overlap)}"
        )
    # The matched right row travels as ONE struct, so the running
    # last() picks it atomically.  Per-column last(ignorenulls=True)
    # — the original formulation — mixed FIELDS from different right
    # rows whenever a right value column held NULL (right_ts from the
    # newest quote, the price from an older one: a row that never
    # existed).  DuckDB/pandas ASOF return the latest row verbatim,
    # NULL fields included.
    r = right.select(
        on,
        ts,
        F.struct(
            F.col(ts).alias(right_ts_alias), *right_value_cols
        ).alias("__r"),
        F.lit(0).alias("__tag"),
    )
    l = left.withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # At equal ts the right row sorts first (__tag 0 < 1): DuckDB/pandas
    # as-of semantics are inclusive (right.ts <= left.ts).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__asof")
    )
    keep = [c for c in left.columns]
    return (
        filled.filter(F.col("__tag") == 1)
        .select(
            *keep,
            *[
                F.col(f"__asof.{c}").alias(c)
                for c in [right_ts_alias, *right_value_cols]
            ],
        )
    )
