"""Time-series operators over the events stream: as-of join and
frame-window statistics (moving average, pct-change, running max).

These extend the reference's time-series surface (SURVEY.md §2.7: its
only window patterns are greatest-per-group / ranked top-K /
ratio-of-total) with the frame-spec windows and as-of correlation a
prices-table consumer needs.  All double aggregation goes through the
fixed-point helpers (operators/exact.py) so results are bit-exact
across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.asof import asof_join
from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import SCALE
from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table


# ---- As-of join: each purchase against the latest prior quote -------------

def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Quotes: every non-purchase event; dedup equal timestamps per user
    # (keep the max-event_id row) so the as-of match is well-defined.
    quotes = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("quote_price"))
    )
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("trade_id"), "ts"
    )
    return asof_join(
        trades,
        quotes,
        on="user_id",
        ts="ts",
        right_value_cols=["quote_price"],
        right_ts_alias="quote_ts",
    ).select("user_id", "trade_id", "ts", "quote_ts", "quote_price")


register(
    "events_asof_join",
    q_events_asof_join,
    """
    WITH quotes AS (
      SELECT user_id, ts, arg_max(value, event_id) AS quote_price
      FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2
    ),
    trades AS (
      SELECT user_id, event_id AS trade_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT t.user_id, t.trade_id, t.ts,
           q.ts AS quote_ts, q.quote_price
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)


# ---- Frame windows: moving average / pct change / running max -------------

def q_events_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    frame7 = w.rowsBetween(-6, Window.currentRow)
    # Fixed-point moving sum -> exact across engines; one double division.
    fixed = F.round(F.col("value") * SCALE).cast("bigint")
    mavg7 = (F.sum(fixed).over(frame7).cast("double") / SCALE) / F.count("*").over(frame7)
    prev = F.lag("value").over(w)
    pct = (F.col("value") - prev) / F.nullif(prev, F.lit(0.0)) * 100.0
    run_max = F.max("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        mavg7.alias("mavg7"),
        pct.alias("pct_change"),
        run_max.alias("run_max"),
    )


register(
    "events_moving_stats",
    q_events_moving_stats,
    f"""
    SELECT user_id, event_id, ts, value,
           (CAST(SUM(CAST(round(value * {SCALE}) AS BIGINT))
                 OVER w7 AS DOUBLE) / {SCALE})
             / COUNT(*) OVER w7                                AS mavg7,
           (value - lag(value) OVER w)
             / nullif(lag(value) OVER w, 0.0) * 100.0          AS pct_change,
           MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)                   AS run_max
    FROM events
    WINDOW w  AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
           w7 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)


# ---- Bucketed range (interval) join ----------------------------------------
# Points-in-intervals via bucket quantization (operators/range_join):
# each daily 08:00-16:00 campaign window joins the events that fall
# inside it WITHOUT a nested-loop — the interval explodes into hour
# buckets, events equi-join on their bucket, the exact range check
# runs as a residual.  Plan pinned nested-loop-free in test_plans.

def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import dsum
    from crypto_price_tracker_with_etl_dashboard_spark.operators.range_join import (
        bucketed_range_join,
    )

    events = load_table(spark, sf_dir, "events")
    days = events.select(F.to_date("ts").alias("day")).distinct()
    intervals = days.select(
        F.date_format("day", "yyyy-MM-dd").alias("campaign_id"),
        (F.col("day").cast("timestamp") + F.expr("INTERVAL 8 HOURS")).alias("w_start"),
        (F.col("day").cast("timestamp") + F.expr("INTERVAL 16 HOURS")).alias("w_end"),
    )
    joined = bucketed_range_join(
        events, intervals, "ts", "w_start", "w_end", bucket_seconds=3600
    )
    return (
        joined.groupBy("campaign_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .orderBy("campaign_id")
    )


from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import (  # noqa: E402
    sql_dsum,
)

register(
    "events_range_join",
    q_events_range_join,
    f"""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    iv AS (
      SELECT strftime(day, '%Y-%m-%d') AS campaign_id,
             CAST(day AS TIMESTAMP) + INTERVAL 8 HOUR  AS w_start,
             CAST(day AS TIMESTAMP) + INTERVAL 16 HOUR AS w_end
      FROM days
    )
    SELECT campaign_id, COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events JOIN iv ON ts >= w_start AND ts < w_end
    GROUP BY campaign_id
    ORDER BY campaign_id
    """,
)


# ---- Temporal-table derivations (operators/temporal.py) --------------------
# Change-point compression and SCD2 validity intervals over the
# prices change log: one window shuffle on the symbol key each.

def q_prices_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.temporal import (
        change_points,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import (
        prices_from_events,
    )

    prices = prices_from_events(spark, sf_dir)
    return (
        change_points(
            prices, key="symbol", order_by=["timestamp", "event_id"],
            value="current_price",
        )
        .select("symbol", "event_id", "current_price", "timestamp")
        .orderBy("symbol", "event_id")
    )


def q_prices_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.temporal import (
        validity_intervals,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import (
        prices_from_events,
    )

    prices = prices_from_events(spark, sf_dir)
    return (
        validity_intervals(
            prices, key="symbol", ts_col="timestamp",
            order_by=["timestamp", "event_id"],
        )
        .select("symbol", "event_id", "current_price", "valid_from", "valid_to")
        .orderBy("symbol", "event_id")
    )


from crypto_price_tracker_with_etl_dashboard_spark.sources import (  # noqa: E402
    PRICES_CTE_SQL,
)

register(
    "prices_change_points",
    q_prices_change_points,
    f"""
    WITH {PRICES_CTE_SQL}
    SELECT symbol, event_id, current_price, timestamp
    FROM (
      SELECT symbol, event_id, current_price, timestamp,
             ROW_NUMBER() OVER w AS rn,
             LAG(current_price) OVER w AS prev
      FROM prices
      WINDOW w AS (PARTITION BY symbol ORDER BY timestamp, event_id)
    )
    WHERE rn = 1 OR current_price IS DISTINCT FROM prev
    ORDER BY symbol, event_id
    """,
)

register(
    "prices_validity_intervals",
    q_prices_validity_intervals,
    f"""
    WITH {PRICES_CTE_SQL}
    SELECT symbol, event_id, current_price,
           timestamp AS valid_from,
           LEAD(timestamp) OVER (
             PARTITION BY symbol ORDER BY timestamp, event_id
           ) AS valid_to
    FROM prices
    ORDER BY symbol, event_id
    """,
)


# ---- Cohort retention matrix ----------------------------------------------
# The classic product-analytics rollup (and, for a training-data
# pipeline, the user-activity drift audit): users cohorted by
# first-seen ISO week, counted per week-offset since their cohort.
# Scale shape: one shuffle on user_id for the per-user first-week
# window (map-side partial-able via the distinct below), then one
# (cohort, offset) aggregation whose output is O(weeks^2) rows —
# tiny forever.  Both engines truncate weeks to the ISO Monday and
# the offset division is exact (week deltas are multiples of 7 days),
# so the row set is integer-deterministic — no float surface at all.

def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    w = Window.partitionBy("user_id")
    wc = uw.withColumn("cohort_week", F.min("week").over(w))
    return (
        wc.select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    "events_retention_cohorts",
    q_events_retention_cohorts,
    """
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    wc AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM uw
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM wc GROUP BY 1, 2 ORDER BY 1, 2
    """,
)


# ---- Ordered conversion funnel ---------------------------------------------
# The product-analytics staple the reference's dashboard family
# implies but never ships: signup -> view -> click -> purchase, each
# stage strictly after the previous AND within a 24h conversion
# window (operators/funnel.py — one user_id shuffle, all stage
# windows in a single per-user sort, O(stages) output).  Registered
# r6 outside the driver window (rotation arithmetic committed to the
# TPC-H tail); check_oracle-certified this round, r7 debut candidate.

_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]
_FUNNEL_WINDOW_H = 24


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, _FUNNEL_STAGES, within_hours=_FUNNEL_WINDOW_H)


from crypto_price_tracker_with_etl_dashboard_spark.operators.funnel import (  # noqa: E402
    funnel_sql,
)

register(
    "events_funnel",
    q_events_funnel,
    funnel_sql(_FUNNEL_STAGES, within_hours=_FUNNEL_WINDOW_H),
)


# ---- hour-of-day seasonality profile ---------------------------------------
# The diurnal-shape profile behind anomaly baselines: how does each
# event type distribute over the 24 hours of the day, and how far
# from uniform is each hour?  Integer counts + ppm-quantized shares
# (the deviation references the exact uniform share round(1e6/24)),
# so every cell is bit-exact.  ONE shuffle: the (type, hour) agg and
# the per-type total window share the event_type hash partitioning.
# Output is |types| x 24 regardless of corpus size.

def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.col("event_type"), F.hour("ts").alias("hour_of_day")
    ).agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy("event_type"))
    share = F.round(F.col("n") * 1000000.0 / total).cast("bigint")
    uniform = 1000000 // 24  # 41666 ppm: exact integer both engines
    return agg.select(
        "event_type", "hour_of_day", "n",
        share.alias("share_ppm"),
        (share - F.lit(uniform)).alias("dev_from_uniform_ppm"),
    ).orderBy("event_type", "hour_of_day")


register(
    "events_seasonality",
    q_events_seasonality,
    f"""
    WITH agg AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hour_of_day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(hour_of_day AS INT) AS hour_of_day, n,
           CAST(round(n * 1000000.0 / SUM(n) OVER (PARTITION BY event_type))
                AS BIGINT) AS share_ppm,
           CAST(round(n * 1000000.0 / SUM(n) OVER (PARTITION BY event_type))
                AS BIGINT) - {1000000 // 24} AS dev_from_uniform_ppm
    FROM agg
    ORDER BY event_type, hour_of_day
    """,
)


# ---- week-over-week trending -----------------------------------------------
# The growth dashboard: weekly event counts per type with the
# week-over-week growth rate, ppm-quantized from two exact integers
# so the series is portable.  ONE shuffle for the (type, week) agg;
# the lag window runs on the O(types x weeks) aggregate.  The first
# week of each type has no prior and reports NULL growth.

def q_events_wow_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.col("event_type"), F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("week").asc())
    prev = F.lag("n").over(w)
    growth = F.when(
        prev.isNotNull() & (prev > 0),
        F.round((F.col("n") - prev) * 1000000.0 / prev).cast("bigint"),
    )
    return weekly.select(
        "event_type", "week", "n",
        prev.alias("prev_n"),
        growth.alias("growth_ppm"),
    ).orderBy("event_type", "week")


register(
    "events_wow_trending",
    q_events_wow_trending,
    """
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS week, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n,
           lag(n) OVER w AS prev_n,
           CASE WHEN lag(n) OVER w > 0 THEN
             CAST(round((n - lag(n) OVER w) * 1000000.0 / lag(n) OVER w)
                  AS BIGINT)
           END AS growth_ppm
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week ASC)
    ORDER BY event_type, week
    """,
)


# ---- incremental aggregate maintenance -------------------------------------
# The lambda-architecture rollup (operators/incremental.py): the
# first 25 days' daily aggregate is the "materialized base"; the
# last 5 days are the delta batch; the certified output is
# finalize(merge(base_state, delta_state)).  The DuckDB oracle
# recomputes from ALL facts — so the green row PROVES merge ==
# recompute, bit-for-bit (fixed-point partials make the equality
# exact).  Shuffles: one per state build (partial-agged) + one
# O(groups) merge; the base facts would not be rescanned in
# production (the state table is what's stored).

_INCR_CUT = "2024-01-26"


def q_events_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.incremental import (
        agg_state,
        finalize,
        merge_states,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
    )
    cut = F.lit(_INCR_CUT).cast("timestamp")
    base = agg_state(ev.filter(F.col("day") < cut), ["event_type", "day"], "value")
    delta = agg_state(ev.filter(F.col("day") >= cut), ["event_type", "day"], "value")
    return finalize(merge_states(base, delta)).orderBy("event_type", "day")


from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import (  # noqa: E402
    SCALE as _SCALE,
)

register(
    "events_incremental_agg",
    q_events_incremental_agg,
    f"""
    SELECT event_type, date_trunc('day', ts) AS day,
           COUNT(*) AS n,
           round(CAST(SUM(CAST(round(value * {_SCALE}) AS DECIMAL(38,0))) AS DOUBLE)
                 / {_SCALE}, 4) AS sum_value,
           round(CAST(SUM(CAST(round(value * {_SCALE}) AS DECIMAL(38,0))) AS DOUBLE)
                 / {_SCALE} / COUNT(*), 6) AS mean_value,
           MIN(value) AS v_min,
           MAX(value) AS v_max
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
)


# ---- Holt forecast over daily event counts ---------------------------------
# Double exponential smoothing (level + trend) per event type over
# the daily count series — the one-step forecaster
# (operators/indicators.py::holt_smooth, integer recursion, WITH
# RECURSIVE oracle).  One (type, day) agg builds the series; the
# fold is one mapInPandas stream.

def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
        holt_smooth,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("value"))
    return holt_smooth(
        daily, key="event_type", order_col="day", value="value"
    ).orderBy("event_type", "day")


def _holt_sql() -> str:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import (
        sql_holt_smooth,
    )

    series_cte = """series AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2
    )"""
    return (
        sql_holt_smooth(series_cte, "event_type", "day")
        + " ORDER BY event_type, day"
    )


register("events_holt_forecast", q_events_holt_forecast, _holt_sql())


# ---- DAU/MAU stickiness -----------------------------------------------------
# The product-health scalar on every growth dashboard: per calendar
# month, the ratio of average daily active users to monthly active
# users, in exact ppm.  One (user, day) distinct pass feeds BOTH the
# daily and monthly counts; everything downstream is O(months) rows.
# stickiness_ppm = (sum of daily DAU x 1e6) div (days x MAU) — pure
# integer arithmetic, so each month's row is a hard verdict.

def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ud = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    daily = ud.groupBy("day").agg(F.count("*").alias("dau"))
    monthly_dau = daily.groupBy(
        F.to_date(F.date_trunc("month", "day")).alias("month")
    ).agg(
        F.count("*").alias("days"), F.sum("dau").alias("sum_dau")
    )
    mau = ud.select(
        F.to_date(F.date_trunc("month", "day")).alias("month"), "user_id"
    ).distinct().groupBy("month").agg(F.count("*").alias("mau"))
    return (
        monthly_dau.join(mau, "month")
        .select(
            "month", "days", "sum_dau", "mau",
            F.expr("sum_dau * 1000000 div (days * mau)").alias("stickiness_ppm"),
        )
        .orderBy("month")
    )


register(
    "events_dau_mau",
    q_events_dau_mau,
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    daily AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
    monthly_dau AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             COUNT(*) AS days, CAST(SUM(dau) AS BIGINT) AS sum_dau
      FROM daily GROUP BY 1
    ),
    mau AS (
      SELECT month, COUNT(*) AS mau FROM (
        SELECT DISTINCT CAST(date_trunc('month', day) AS DATE) AS month, user_id
        FROM ud
      ) GROUP BY 1
    )
    SELECT month, days, sum_dau, mau,
           (sum_dau * 1000000) // (days * mau) AS stickiness_ppm
    FROM monthly_dau JOIN mau USING (month)
    ORDER BY month
    """,
)


# ---- CUSUM drift detection --------------------------------------------------
# Cumulative-sum change detection (Page, Biometrika 1954) on the
# daily event-count series per type, made INTEGER-exact by scaling:
# the deviation (x_d - mean) is irrational in general, but
# x_d * D - total (D = number of days, total = sum of counts) is its
# exact D-scaled integer twin, so the running CUSUM and its extremes
# are hard integer verdicts.  The corpus pays one (type, day) agg;
# the cumulative window runs per type over the calendar-bounded
# daily grid.  Output: the peak |CUSUM| and the day it peaks —
# the candidate change point — per event type.

def q_events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("x"))
    wtot = Window.partitionBy("event_type")
    wcum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # windows cannot nest in one expression: stage 1 attaches the
    # per-type scale D and total, stage 2 runs the cumulative sum —
    # both stages share the single event_type partitioning
    enriched = daily.select(
        "event_type", "day", "x",
        F.count("*").over(wtot).alias("D"),
        F.sum("x").over(wtot).alias("total"),
    )
    scored = enriched.select(
        "event_type", "day",
        F.sum(F.col("x") * F.col("D") - F.col("total")).over(wcum).alias(
            "cusum_scaled"
        ),
        F.col("D").alias("days"),
    )
    return (
        scored.withColumn("abs_cusum", F.abs("cusum_scaled"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("abs_cusum").desc(), F.col("day").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type", "days",
            F.col("cusum_scaled").alias("peak_cusum_scaled"),
            F.col("day").alias("at_day"),
        )
        .orderBy("event_type")
    )


register(
    "events_cusum_drift",
    q_events_cusum_drift,
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day,
             CAST(SUM(x * D - total) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cusum_scaled,
             D AS days
      FROM (
        SELECT event_type, day, x,
               COUNT(*) OVER (PARTITION BY event_type) AS D,
               CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM daily
      )
    )
    SELECT event_type, days, cusum_scaled AS peak_cusum_scaled, day AS at_day
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(cusum_scaled) DESC, day ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    ORDER BY event_type
    """,
)


# ---- Conversion-latency percentiles ----------------------------------------
# How long from first view to first purchase?  Exact p50/p90/p99 of
# the per-user latency WITHOUT a corpus-sized single-partition sort:
# the latency table ranks through operators/rank.py::global_rank
# (bucketed prefix sums — the pack_chunks decomposition), and the
# quantile targets are integer ranks ceil(n*q/100), so every output
# value is a hard verdict.  Latencies in whole seconds via the
# boundary-crossing count (DuckDB date_diff('second') == difference
# of epoch-second floors == Spark unix_timestamp subtraction).

_LATENCY_QUANTILES = (50, 90, 99)


def q_events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.rank import (
        global_rank,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("tv")
    )
    lat = (
        ev.filter(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(F.min("ts").alias("tp"))
        .select(
            "user_id",
            (F.unix_timestamp("tp") - F.unix_timestamp("tv")).alias("lat_sec"),
        )
    )
    ranked = global_rank(
        lat,
        order_by=[F.col("lat_sec").asc(), F.col("user_id").asc()],
        bucket=F.expr("lat_sec div 3600"),
    )
    n = lat.agg(F.count("*").alias("n"))
    targets = n.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("pct"),
                        F.expr(f"(n * {q} + 99) div 100").alias("target"),
                    )
                    for q in _LATENCY_QUANTILES
                ]
            )
        ).alias("t"),
    ).select("n", F.col("t.pct").alias("pct"), F.col("t.target").alias("target"))
    return (
        ranked.join(
            F.broadcast(targets), F.col("rank") == F.col("target")
        )
        .select("pct", "lat_sec", F.col("n").alias("n_users"))
        .orderBy("pct")
    )


register(
    "events_conversion_latency",
    q_events_conversion_latency,
    """
    WITH ev AS (
      SELECT user_id, event_type, ts FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    views AS (
      SELECT user_id, MIN(ts) AS tv FROM ev
      WHERE event_type = 'view' GROUP BY 1
    ),
    lat AS (
      SELECT e.user_id,
             date_diff('second', v.tv, MIN(e.ts)) AS lat_sec
      FROM ev e JOIN views v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= v.tv
      GROUP BY e.user_id, v.tv
    ),
    ranked AS (
      SELECT lat_sec,
             row_number() OVER (ORDER BY lat_sec ASC, user_id ASC) AS rnk
      FROM lat
    ),
    n AS (SELECT COUNT(*) AS n FROM lat),
    targets AS (
      SELECT n, pct, (n * pct + 99) // 100 AS target
      FROM n, (VALUES (50), (90), (99)) q(pct)
    )
    SELECT t.pct, r.lat_sec, t.n AS n_users
    FROM ranked r JOIN targets t ON r.rnk = t.target
    ORDER BY t.pct
    """,
)


# ---- rolling 7-day active users (sliding WAU) --------------------------------
# The sliding-window twin of events_dau_mau's calendar months: for
# every day in the observed range, the EXACT count of distinct users
# active in the trailing 7 days.  Sliding distinct resists window
# frames (COUNT(DISTINCT) OVER RANGE is unsupported / a sort trap),
# so the scale-correct shape is contribution expansion: each (user,
# day) presence row contributes to 7 target days, then one distinct +
# count per target day — shuffle volume is a fixed 7x the presence
# table (days-bounded), never user x day-range.  Trailing targets
# past the last observed day are trimmed against the 1-row max-day
# aggregate (broadcast, never collected).
_WAU_WINDOW = 7


def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    max_day = ud.agg(F.max("day").alias("max_day"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(0, {_WAU_WINDOW - 1})")
            ).alias("__k"),
            "day",
        )
        .select("user_id", F.expr("date_add(day, __k)").alias("day"))
        .distinct()
    )
    return (
        contrib.crossJoin(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
        .orderBy("day")
    )


register(
    "events_rolling_wau",
    q_events_rolling_wau,
    f"""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    contrib AS (
      SELECT DISTINCT user_id, day + k AS day
      FROM ud CROSS JOIN (
        SELECT CAST(unnest(range(0, {_WAU_WINDOW})) AS INTEGER) AS k
      )
    ),
    md AS (SELECT MAX(day) AS max_day FROM ud)
    SELECT day, COUNT(*) AS wau
    FROM contrib CROSS JOIN md
    WHERE day <= max_day
    GROUP BY day ORDER BY day
    """,
)


# ---- growth accounting (user lifecycle states) ---------------------------------
# The standard weekly growth-accounting decomposition: every active
# user is NEW (first week), RETAINED (active last week too), or
# RESURRECTED (active before, absent last week); CHURNED counts last
# week's actives who went quiet.  Week-over-week set logic via one
# lag over each user's distinct active-week spine — the report that
# explains WHY the active count moved.


def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    uw = ev.select(
        "user_id",
        F.to_date(F.date_trunc("week", "ts")).alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    tagged = uw.select(
        "user_id", "week",
        F.lag("week").over(w).alias("__prev"),
    ).select(
        "week",
        F.expr(
            "CASE WHEN __prev IS NULL THEN 'new'"
            " WHEN date_add(__prev, 7) = week THEN 'retained'"
            " ELSE 'resurrected' END"
        ).alias("state"),
    )
    active = tagged.groupBy("week").pivot(
        "state", ["new", "retained", "resurrected"]
    ).count().na.fill(0)
    # churned(w) = actives(w-1) - retained(w)
    totals = uw.groupBy("week").agg(F.count("*").cast("bigint").alias("actives"))
    prev_tot = totals.select(
        F.expr("date_add(week, 7)").alias("week"),
        F.col("actives").alias("__prev_actives"),
    )
    return (
        active.join(totals, "week")
        .join(prev_tot, "week", "left")
        .select(
            "week",
            F.col("actives"),
            F.col("new").cast("bigint").alias("new"),
            F.col("retained").cast("bigint").alias("retained"),
            F.col("resurrected").cast("bigint").alias("resurrected"),
            F.coalesce(
                F.col("__prev_actives") - F.col("retained"), F.lit(0)
            ).cast("bigint").alias("churned"),
        )
        .orderBy("week")
    )


register(
    "events_growth_accounting",
    q_events_growth_accounting,
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    tagged AS (
      SELECT week,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN prev + 7 = week THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM (
        SELECT user_id, week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
        FROM uw
      )
    ),
    pivoted AS (
      SELECT week,
             CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS new,
             CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
               AS retained,
             CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected
      FROM tagged GROUP BY week
    ),
    totals AS (
      SELECT week, CAST(COUNT(*) AS BIGINT) AS actives FROM uw GROUP BY week
    )
    SELECT p.week, t.actives, p.new, p.retained, p.resurrected,
           CAST(COALESCE(pt.actives - p.retained, 0) AS BIGINT) AS churned
    FROM pivoted p
    JOIN totals t USING (week)
    LEFT JOIN (SELECT week + 7 AS week, actives FROM totals) pt USING (week)
    ORDER BY p.week
    """,
)


# ---- seasonal-residual anomalies ---------------------------------------------
# events_seasonality reports the hour/weekday PROFILE; this flags the
# cells that break it: per (day, hour) traffic vs an additive
# two-factor expectation (hour-of-day effect + day-of-week effect
# over the dense day x hour grid), top-10 by absolute residual.  All
# milli-count fixed point — the three means are integer divisions
# over exact grid sums, so the residual ranking is bit-portable.
# Plan: one hash agg to the (day, hour) grid (dense-completed by a
# broadcast day x 24 spine), two tiny profile aggs broadcast back;
# the top-10 is a distributed TakeOrdered over |days|*24 rows.

_RESID_TOPK = 10


def q_events_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hour")
    ).agg(F.count("*").cast("bigint").alias("c"))
    days = obs.select("day").distinct()
    hours = (
        days.sparkSession.range(24)
        .select(F.col("id").cast("int").alias("hour"))
    )
    grid = (
        days.crossJoin(F.broadcast(hours))
        .join(obs, ["day", "hour"], "left")
        .select("day", "hour", F.coalesce("c", F.lit(0).cast("bigint")).alias("c"))
    )
    n_days = days.agg(F.count("*").cast("bigint").alias("n_days"))
    total = grid.agg(F.sum("c").cast("bigint").alias("total"))
    hm = grid.groupBy("hour").agg(F.sum("c").cast("bigint").alias("h_sum"))
    dm = (
        grid.withColumn("dow", F.dayofweek("day"))
        .groupBy("dow")
        .agg(
            F.sum("c").cast("bigint").alias("d_sum"),
            F.count("*").cast("bigint").alias("d_cells"),
        )
    )
    scored = (
        grid.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(hm), "hour")
        .join(F.broadcast(dm), "dow")
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(total))
        .select(
            "day",
            "hour",
            "c",
            F.expr(
                "h_sum * 1000 div n_days"
                " + d_sum * 1000 div d_cells"
                " - total * 1000 div (n_days * 24)"
            ).alias("expected_milli"),
        )
        .withColumn(
            "residual_milli", F.expr("c * 1000 - expected_milli")
        )
    )
    return (
        scored.orderBy(
            F.abs(F.col("residual_milli")).desc(),
            F.col("day").asc(),
            F.col("hour").asc(),
        )
        .limit(_RESID_TOPK)
        .select("day", "hour", "c", "expected_milli", "residual_milli")
    )


register(
    "events_seasonal_residuals",
    q_events_seasonal_residuals,
    f"""
    WITH obs AS (
      SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS hour,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM obs),
    grid AS (
      SELECT d.day, h.hour, COALESCE(o.c, CAST(0 AS BIGINT)) AS c
      FROM days d
      CROSS JOIN (SELECT CAST(unnest(range(0, 24)) AS INT) AS hour) h
      LEFT JOIN obs o ON o.day = d.day AND o.hour = h.hour
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM grid),
    hm AS (SELECT hour, CAST(SUM(c) AS BIGINT) AS h_sum FROM grid GROUP BY 1),
    dm AS (
      SELECT dayofweek(day) AS dow, CAST(SUM(c) AS BIGINT) AS d_sum,
             CAST(COUNT(*) AS BIGINT) AS d_cells
      FROM grid GROUP BY 1
    ),
    scored AS (
      SELECT g.day, g.hour, g.c,
             hm.h_sum * 1000 // nd.n_days
               + dm.d_sum * 1000 // dm.d_cells
               - tot.total * 1000 // (nd.n_days * 24) AS expected_milli
      FROM grid g
      JOIN hm USING (hour)
      JOIN dm ON dm.dow = dayofweek(g.day)
      CROSS JOIN nd CROSS JOIN tot
    )
    SELECT day, hour, c, expected_milli,
           c * 1000 - expected_milli AS residual_milli
    FROM scored
    ORDER BY abs(c * 1000 - expected_milli) DESC, day ASC, hour ASC
    LIMIT {_RESID_TOPK}
    """,
)
