"""Query registry: names -> (PySpark callable, oracle SQL).

Each submodule registers its queries with ``register``; the driver
contract (__spark_entry__.py) re-exports the two dicts.  A query
registered with ``sql=None`` gets the driver's weaker rows-only check
(used only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    if name in SPARK_QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    SPARK_QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


from crypto_price_tracker_with_etl_dashboard_spark.queries import reference  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import relational  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import tpch  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import timeseries  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import olap  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import sampling  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import text  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import vector  # noqa: E402,F401
from crypto_price_tracker_with_etl_dashboard_spark.queries import multimodal  # noqa: E402,F401
