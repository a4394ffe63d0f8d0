"""Temporal table operators over append-only series.

The reference's ``prices`` model (SURVEY.md §1.1) is an append-only
change log; two classic derivations turn it into a temporal table:

- change-point compression: drop rows whose value equals the
  previous observation of the same key (tick dedup / delta
  encoding) — the storage-side fix for the reference's habit of
  re-inserting unchanged prices every 5 minutes.
- SCD2 validity intervals: each observation becomes a
  [valid_from, valid_to) row, the open row having NULL valid_to —
  the standard point-in-time-join input.

Both are one window shuffle on the series key with a total order
(timestamp + tiebreaker) inside each key — per-key sorted state,
spillable, no cross-key coordination, so the plan is
partition-count- and scale-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_points(
    df: DataFrame,
    key: str,
    order_by: list[str],
    value: str,
) -> DataFrame:
    """Keep the first row and every row whose ``value`` differs from
    the previous row of the same ``key`` (NULL-safe comparison)."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    prev = F.lag(value).over(w)
    first = F.row_number().over(w) == 1
    changed = ~F.col(value).eqNullSafe(prev)
    return (
        df.withColumn("_keep", first | changed)
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def validity_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """SCD2: add ``valid_from`` (= ``ts_col``) and ``valid_to``
    (= next observation's ``ts_col``; NULL while current)."""
    order_by = order_by or [ts_col]
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    return df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
