"""Reference-parity queries (SURVEY.md section 2) over the
``prices`` series derived from the driver's ``events`` table
(FIXTURES.md section 3 mapping).  Each Spark query is paired with the
equivalent ANSI SQL over the same CTE for the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators import (
    display_snapshot,
    distinct_symbols,
    history_slice,
    latest_snapshot,
    market_share,
    topk_with_other,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import sql_dsum
from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.sources import prices_from_events, PRICES_CTE_SQL
from crypto_price_tracker_with_etl_dashboard_spark.sources.ingest import validate_and_normalize

_LATEST_CTE = """
latest AS (
  SELECT symbol, name, current_price, market_cap, total_volume, timestamp
  FROM prices
  QUALIFY row_number() OVER (PARTITION BY symbol
                             ORDER BY timestamp DESC, event_id DESC) = 1
)
"""


# ---- J1+A1+O1+D1: latest-per-symbol snapshot ------------------------------

def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_snapshot(prices_from_events(spark, sf_dir))


register(
    "latest_snapshot",
    q_latest_snapshot,
    f"WITH {PRICES_CTE_SQL}, {_LATEST_CTE} SELECT * FROM latest",
)


# ---- P6-P8 + O2: per-symbol history slice ---------------------------------

_HIST_SYMBOL = "c7"
_HIST_START = "2024-01-05"
_HIST_END = "2024-01-12"  # inclusive date; bound is exclusive next-day


def q_history_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    prices = prices_from_events(spark, sf_dir)
    return history_slice(prices, _HIST_SYMBOL, _HIST_START, _HIST_END)


register(
    "history_slice",
    q_history_slice,
    f"""
    WITH {PRICES_CTE_SQL}
    SELECT symbol, name, current_price, market_cap, total_volume, timestamp
    FROM prices
    WHERE symbol = '{_HIST_SYMBOL}'
      AND timestamp >= TIMESTAMP '{_HIST_START} 00:00:00'
      AND timestamp < TIMESTAMP '{_HIST_END} 00:00:00' + INTERVAL 1 DAY
    ORDER BY timestamp
    """,
)


# ---- O4+A2+D2: top-K by market cap with 'Other' rollup --------------------

_RANKED_CTE = """
ranked AS (
  SELECT upper(symbol) AS label, market_cap,
         row_number() OVER (ORDER BY market_cap DESC, symbol ASC) AS rnk
  FROM latest
  WHERE market_cap IS NOT NULL AND market_cap > 0
)
"""

_SEGMENTS_SQL = f"""
SELECT label, market_cap FROM ranked WHERE rnk <= 7
UNION ALL
SELECT 'Other' AS label,
       {sql_dsum('market_cap')} AS market_cap
FROM ranked WHERE rnk > 7
HAVING COUNT(*) > 0
"""


def q_topk_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = latest_snapshot(prices_from_events(spark, sf_dir), order_by_cap=False)
    return topk_with_other(snap, k=7)


register(
    "topk_other",
    q_topk_other,
    f"WITH {PRICES_CTE_SQL}, {_LATEST_CTE}, {_RANKED_CTE} {_SEGMENTS_SQL}",
)


# ---- A3+A4: ratio-of-total market share -----------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = latest_snapshot(prices_from_events(spark, sf_dir), order_by_cap=False)
    return market_share(snap, k=7)


register(
    "market_share",
    q_market_share,
    f"""
    WITH {PRICES_CTE_SQL}, {_LATEST_CTE}, {_RANKED_CTE},
    segments AS ({_SEGMENTS_SQL}),
    tot AS (
      SELECT {sql_dsum('market_cap')} AS total
      FROM segments
    )
    SELECT label, market_cap,
           round(market_cap / total * 100.0, 2) AS pct
    FROM segments CROSS JOIN tot
    """,
)


# ---- P4+P10+P13: dashboard-table display projection ------------------------

def _sql_grouped(col: str) -> str:
    """DuckDB twin of operators/dashboard.py::_grouped_display —
    toLocaleString() semantics: thousands grouping, up to 3 fraction
    digits, trailing zeros trimmed.  DuckDB's fmtlib format() cannot
    thousands-group floats, so the value is split at fixed-point:
    round to the 3dp grid FIRST (same HALF_UP as the Spark side),
    re-scale to an exact milli integer, group the integer part and
    lpad the fraction."""
    m = f"CAST(round(round({col}, 3) * 1000) AS BIGINT)"
    grouped = (
        f"format('{{:,}}', {m} // 1000) || '.' || "
        f"lpad(CAST({m} % 1000 AS VARCHAR), 3, '0')"
    )
    return (
        f"regexp_replace(regexp_replace({grouped},"
        f" '(\\.\\d*?)0+$', '\\1'), '\\.$', '')"
    )


def q_display_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = latest_snapshot(prices_from_events(spark, sf_dir), order_by_cap=False)
    return display_snapshot(snap)


register(
    "display_snapshot",
    q_display_snapshot,
    f"""
    WITH {PRICES_CTE_SQL}, {_LATEST_CTE}
    SELECT upper(symbol) AS symbol, name,
           concat('$', coalesce(
             CASE WHEN current_price <> 0 THEN
               CAST(CAST(round(current_price, 4) AS DECIMAL(28,4)) AS VARCHAR)
             END, 'N/A')) AS price_display,
           concat('$', coalesce(
             CASE WHEN market_cap <> 0 THEN {_sql_grouped('market_cap')}
             END, 'N/A')) AS market_cap_display,
           concat('$', coalesce(
             CASE WHEN total_volume <> 0 THEN {_sql_grouped('total_volume')}
             END, 'N/A')) AS volume_display,
           timestamp
    FROM latest
    """,
)


# ---- A5+O5: distinct sorted symbols ----------------------------------------

def q_distinct_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_symbols(prices_from_events(spark, sf_dir))


register(
    "distinct_symbols",
    q_distinct_symbols,
    f"WITH {PRICES_CTE_SQL} SELECT DISTINCT symbol FROM prices ORDER BY symbol",
)


# ---- P1-P3+P5: ingest validate/project/normalize ---------------------------
# Simulates the semi-structured CoinGecko batch (nullable fields, mixed
# case, extra columns) deterministically from events, then applies the
# ingest transform.  Mirrors etl/crypto_etl.py:82-106.

_BATCH_TS = dt.datetime(2024, 2, 1, 0, 0, 0)

_RAW_CTE = """
raw AS (
  SELECT
    CASE WHEN event_id % 97 = 0 THEN NULL
         ELSE concat('C', CAST(user_id AS VARCHAR)) END  AS symbol,
    CASE WHEN event_id % 89 = 0 THEN NULL
         ELSE concat('Coin ', CAST(user_id AS VARCHAR)) END AS name,
    CASE WHEN event_id % 83 = 0 THEN NULL ELSE value END AS current_price,
    CASE WHEN event_id % 19 = 0 THEN NULL
         ELSE value * 1000000.0 END                      AS market_cap,
    CASE WHEN event_id % 23 = 0 THEN NULL
         ELSE value * 50000.0 END                        AS total_volume,
    event_type                                           AS extra_ignored
  FROM events
)
"""


def _raw_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    null_if = lambda mod, col: F.when(F.col("event_id") % mod == 0, F.lit(None)).otherwise(col)
    return ev.select(
        null_if(97, F.concat(F.lit("C"), F.col("user_id").cast("string"))).alias("symbol"),
        null_if(89, F.concat(F.lit("Coin "), F.col("user_id").cast("string"))).alias("name"),
        null_if(83, F.col("value")).cast("double").alias("current_price"),
        null_if(19, F.col("value") * 1000000.0).cast("double").alias("market_cap"),
        null_if(23, F.col("value") * 50000.0).cast("double").alias("total_volume"),
        F.col("event_type").alias("extra_ignored"),
    )


def q_ingest_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate_and_normalize(_raw_batch(spark, sf_dir), _BATCH_TS)


register(
    "ingest_normalize",
    q_ingest_normalize,
    f"""
    WITH {_RAW_CTE}
    SELECT lower(symbol) AS symbol, name, current_price, market_cap,
           total_volume, TIMESTAMP '2024-02-01 00:00:00' AS timestamp
    FROM raw
    WHERE symbol IS NOT NULL AND name IS NOT NULL AND current_price IS NOT NULL
    """,
)


# ---- T5 extension: tumbling-window OHLC candles ---------------------------

def q_prices_ohlc_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.streaming.windows import ohlc_candles

    prices = prices_from_events(spark, sf_dir)
    return ohlc_candles(prices, tiebreak_col="event_id", exact_volume=True)


# Shared candles CTE (also the base of prices_heikin_ashi's oracle —
# the arg_min/arg_max weight is exactness-critical and must not fork:
# epoch()::HUGEINT rounding is only safe because event_id is
# ts-monotone in this corpus).  Requires the prices CTE in scope.
OHLC_CANDLES_CTE_SQL = f"""candles AS (
      SELECT symbol,
             CAST(to_timestamp(floor(epoch(timestamp) / 300) * 300)
                  AS TIMESTAMP)                                      AS window_start,
             CAST(to_timestamp(floor(epoch(timestamp) / 300) * 300 + 300)
                  AS TIMESTAMP)                                      AS window_end,
             arg_min(current_price,
                     epoch(timestamp)::HUGEINT * 10000000000 + event_id) AS open,
             MAX(current_price)                                      AS high,
             MIN(current_price)                                      AS low,
             arg_max(current_price,
                     epoch(timestamp)::HUGEINT * 10000000000 + event_id) AS close,
             {sql_dsum('total_volume')}                              AS volume,
             COUNT(*)                                                AS n_ticks
      FROM prices
      GROUP BY 1, 2, 3
    )"""


register(
    "prices_ohlc_5min",
    q_prices_ohlc_5min,
    f"""
    WITH {PRICES_CTE_SQL},
    {OHLC_CANDLES_CTE_SQL}
    SELECT symbol, window_start, window_end, open, high, low, close,
           volume, n_ticks
    FROM candles
    """,
)
