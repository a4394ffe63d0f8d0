"""Ordered conversion funnel over an event stream.

The classic product-analytics operator the reference's dashboard
family implies but never ships (SURVEY.md §2.7 stops at ranked
top-K): for an ordered list of stages, each user must reach stage
``i+1`` STRICTLY AFTER stage ``i`` — the first qualifying timestamp
per stage is kept, and the funnel reports how many users survive to
each stage.

Scale shape: ONE shuffle on the user key.  Every stage is a
``min(when(...))`` over the same user-partitioned window, so Spark
sorts each partition once and evaluates all stage windows in a
single WindowExec chain (no per-stage join, no re-shuffle — a
join-per-stage formulation would run len(stages) shuffles and
re-scan the events table per stage).  The per-user stage times then
collapse through one partial-aggregated count, so the output is
O(len(stages)) rows regardless of corpus size.

Determinism: timestamps and counts only — no floating point anywhere,
so results are bit-identical on any engine and any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_hours: int | None = None,
) -> DataFrame:
    """Ordered funnel: one output row per stage with the number of
    users whose first qualifying event chain reaches it.

    A user reaches stage 0 at ``min(ts | type = stages[0])`` and
    stage i at ``min(ts | type = stages[i], ts > t_{i-1})`` — the
    strict ``>`` makes same-timestamp stage hops non-qualifying (a
    deterministic rule both engines share at microsecond precision).
    ``within_hours`` adds the standard conversion window: stage i
    must also land within that many hours of stage i-1 (exact
    microsecond interval arithmetic — no float surface).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    if within_hours is not None and within_hours <= 0:
        raise ValueError(f"within_hours must be positive, got {within_hours}")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: F.Column | None = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(f"__t{i - 1}"))
            if within_hours is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= F.col(f"__t{i - 1}")
                    + F.expr(f"INTERVAL {within_hours} HOURS")
                )
        # each stage's window reads the previous stage's column, so
        # the windows chain inside one user-partitioned sort
        df = df.withColumn(f"__t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(f"__t{i}")
    per_user = df.select(
        user_col, *[f"__t{i}" for i in range(len(stages))]
    ).distinct()
    counts = per_user.agg(
        *[
            F.count(F.col(f"__t{i}")).alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"__n{i}").cast("bigint").alias("n_users"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.stage_idx", "r.stage", "r.n_users")
        .orderBy("stage_idx")
    )


def funnel_sql(
    stages: list[str],
    table: str = "events",
    within_hours: int | None = None,
) -> str:
    """The DuckDB mirror of :func:`funnel` (chained window CTEs with
    the same strict-inequality + conversion-window rules), used by
    the oracle registry."""
    cols, src = [], table
    for i, stage in enumerate(stages):
        # SQL string-literal escape: a stage name containing a quote
        # must not break (or inject into) the oracle text
        lit = stage.replace("'", "''")
        cond = f"event_type = '{lit}'"
        if i > 0:
            cond += f" AND ts > __t{i - 1}"
            if within_hours is not None:
                cond += f" AND ts <= __t{i - 1} + INTERVAL {within_hours} HOUR"
        keep = ", ".join(f"__t{j}" for j in range(i))
        keep = keep + ", " if keep else ""
        cols.append(
            f"s{i} AS (SELECT user_id, {keep}"
            f"MIN(CASE WHEN {cond} THEN ts END)"
            f" OVER (PARTITION BY user_id) AS __t{i}, event_type, ts"
            f" FROM {src})"
        )
        src = f"s{i}"
    n = len(stages)
    per_user = (
        "pu AS (SELECT DISTINCT user_id, "
        + ", ".join(f"__t{i}" for i in range(n))
        + f" FROM s{n - 1})"
    )
    stage_rows = ", ".join(
        f"({i}, '{s}', (SELECT COUNT(__t{i}) FROM pu))"
        for i, s in enumerate(stages)
    )
    return (
        "WITH "
        + ", ".join(cols + [per_user])
        + " SELECT * FROM (VALUES "
        + stage_rows
        + ") AS t(stage_idx, stage, n_users) ORDER BY stage_idx"
    )
