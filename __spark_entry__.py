"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one PySpark callable per implemented operator
(SURVEY.md section 2 + north-star extensions).
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle.

Determinism contract with the oracle: every double aggregate goes
through exact fixed-point BIGINT accumulation (4 decimal places)
before one final double division (see operators/exact.py), every
rank/top-k has a total-order tiebreaker, and the Spark session runs
in UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_price_tracker_with_etl_dashboard_spark.session import tune_session
from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES, ORACLE_SQL
from crypto_price_tracker_with_etl_dashboard_spark.sources import prices_from_events
from crypto_price_tracker_with_etl_dashboard_spark.operators import latest_snapshot


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest-per-symbol
    snapshot of the prices series (the reference's /api/crypto)."""
    tune_session(spark)
    prices = prices_from_events(spark, "/root/testdata/sf0.001")
    return latest_snapshot(prices)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every callable first applies the runtime-settable session tuning
    (UTC timezone for oracle parity, AQE) — the driver invokes these
    with its OWN SparkSession, which entry()'s tuning never touched."""

    def tuned(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: tuned(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
