"""Kaplan-Meier survival estimation over per-key lifetimes.

The product-limit estimator (Kaplan & Meier, JASA 1958) is the
standard churn/retention readout the reference's dashboard family
implies but never ships: given each user's observed lifetime and a
right-censoring flag (users still active at the end of the data
cannot have churned yet), the survival probability after week t is

    S(t) = prod_{i <= t} (n_i - d_i) / n_i

with n_i users at risk entering week i and d_i observed churns in
week i.  Censored users count toward the risk sets up to their last
observed week but never as deaths — dropping them instead (the naive
"churn = last activity" readout) biases survival DOWN by treating
every still-active user as dead.

Exactness discipline: the running product is the fourth certified
arbitrary-length INTEGER recursion (after EMA/MACD, Heikin-Ashi and
Holt):

    su_i = su_{i-1} * (n_i - d_i) // n_i        su_{-1} = 1_000_000

in parts-per-million units with truncating division (all terms
nonnegative, so Python ``//`` == DuckDB ``//``); an oracle re-derives
every row bit-for-bit via WITH RECURSIVE.  A float cumulative product
(exp-sum-log or a running double) would drift between engines.

Execution shape: the distributed work is ONE shuffle — the per-key
(min, max) lifetime aggregate over the fact table.  Everything after
operates on the duration histogram, whose row count is bounded by
the CALENDAR (one row per distinct whole-week duration inside the
data's time span), not by the corpus, so the risk-set window and the
sequential fold run on a provably tiny relation at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def km_curve(
    lifetimes: DataFrame,
    duration: str = "duration_weeks",
    churned: str = "churned",
) -> DataFrame:
    """Kaplan-Meier curve from a per-subject lifetime table.

    ``lifetimes`` has one row per subject with an integer ``duration``
    (whole weeks survived) and a boolean ``churned`` (True = the
    churn event was observed; False = right-censored).  Returns one
    row per distinct observed duration: (week, n_risk, deaths,
    survival_ppm), survival after that week's deaths.
    """
    import pandas as pd

    hist = lifetimes.groupBy(F.col(duration).alias("week")).agg(
        F.count("*").alias("__n"),
        F.sum(F.when(F.col(churned), 1).otherwise(0)).alias("deaths"),
    )
    # risk set entering week t = subjects whose duration >= t:
    # reverse cumulative sum.  The unpartitioned window is safe HERE
    # (and only here): hist is one row per distinct whole-week
    # duration, bounded by the data's calendar span — O(weeks), not
    # O(subjects) — the same bounded-aggregate argument as
    # events_retention_cohorts' output.
    wrev = Window.orderBy(F.col("week").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grid = hist.select(
        "week",
        F.sum("__n").over(wrev).alias("n_risk"),
        "deaths",
    )

    def fold(batches):
        su = PPM
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for n, d in zip(pdf["n_risk"].tolist(), pdf["deaths"].tolist()):
                su = su * (int(n) - int(d)) // int(n)
                out.append(su)
            pdf = pdf.copy()
            pdf["survival_ppm"] = out
            yield pdf

    # the fold is inherently sequential over the O(weeks) grid; one
    # partition sorted ascending streams it through the recursion
    return (
        grid.coalesce(1)
        .sortWithinPartitions("week")
        .mapInPandas(
            fold,
            schema="week long, n_risk long, deaths long, survival_ppm long",
        )
    )


def sql_km_curve(
    lifetimes_cte: str,
    duration: str = "duration_weeks",
    churned: str = "churned",
) -> str:
    """DuckDB mirror of :func:`km_curve`: the same integer recursion
    via WITH RECURSIVE over the rn-indexed duration histogram.
    ``lifetimes_cte`` is the body of a CTE producing the lifetime
    table (one row per subject)."""
    return f"""
    WITH RECURSIVE lifetimes AS ({lifetimes_cte}),
    hist AS (
      SELECT {duration} AS week, COUNT(*) AS n,
             COUNT(*) FILTER ({churned}) AS deaths
      FROM lifetimes GROUP BY 1
    ),
    grid AS (
      SELECT week,
             CAST(SUM(n) OVER (ORDER BY week DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n_risk,
             deaths,
             row_number() OVER (ORDER BY week ASC) AS rn
      FROM hist
    ),
    km AS (
      SELECT rn, week, n_risk, deaths,
             ({PPM} * (n_risk - deaths)) // n_risk AS su
      FROM grid WHERE rn = 1
      UNION ALL
      SELECT g.rn, g.week, g.n_risk, g.deaths,
             (k.su * (g.n_risk - g.deaths)) // g.n_risk
      FROM grid g JOIN km k ON g.rn = k.rn + 1
    )
    SELECT week, n_risk, deaths, su AS survival_ppm
    FROM km ORDER BY week
    """
