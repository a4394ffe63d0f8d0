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

# ---------------------------------------------------------------------------
# Registration ORDER is part of the driver contract: the driver's
# correctness gate verifies the FIRST 50 registered queries against the
# DuckDB oracle.  Module import order interleaves registrations, so we
# pin the window explicitly: reference parity first, then the
# training-data-pipeline surface (dedup / text / sampling / vector /
# multimodal — the north-star scope), then one query per distinct
# relational/OLAP operator family, then representative TPC-H
# compositions.  Everything past the window stays registered (it still
# runs in bench.py and the repo's own oracle harness) but is
# deliberately the most redundant tail: TPC-H variants whose join/agg
# shapes are already covered inside the window.
# ---------------------------------------------------------------------------

DRIVER_WINDOW = 50

PRIORITY_ORDER: list[str] = [
    # reference parity core (7)
    "latest_snapshot", "history_slice", "topk_other", "market_share",
    "distinct_symbols", "ingest_normalize", "prices_ohlc_5min",
    # deduplication family (6)
    "doc_exact_dedup", "doc_minhash_lsh", "doc_ngram_jaccard", "doc_simhash",
    "doc_dup_clusters", "doc_decontaminate",
    # text-analysis family (6)
    "doc_quality", "doc_langid", "doc_token_bpe", "doc_fingerprint",
    "doc_winnow", "doc_top_terms",
    # sampling / packing family (4)
    "doc_hash_split", "doc_stratified_sample", "doc_pack_chunks",
    "events_per_user_cap",
    # similarity-search family (5)
    "emb_cosine_topk", "emb_ann_recall", "emb_ivf_topk",
    "emb_cosine_neardup", "emb_label_centroids",
    # multimodal family (2)
    "media_decode", "media_frame_sample",
    # relational / time-series / OLAP operator families (17)
    "events_sessionize", "events_asof_join", "events_range_join",
    "events_moving_stats", "events_daily_pivot", "events_unpivot",
    "prices_validity_intervals", "orders_rollup", "events_cube",
    "returned_orders_semi", "churned_customers_anti", "user_cohort_setops",
    "events_json_extract", "daily_distinct_users",
    "daily_approx_distinct_users", "event_value_quantiles",
    "event_value_quantiles_approx",
    # representative TPC-H compositions (3)
    "q1_pricing_summary", "q3_shipping_priority", "q12_delay_priority",
]


def _apply_priority_order() -> None:
    missing = [n for n in PRIORITY_ORDER if n not in SPARK_QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY_ORDER names not registered: {missing}")
    if len(PRIORITY_ORDER) != DRIVER_WINDOW:
        raise RuntimeError(
            f"PRIORITY_ORDER has {len(PRIORITY_ORDER)} names, expected {DRIVER_WINDOW}"
        )
    ordered = {n: SPARK_QUERIES[n] for n in PRIORITY_ORDER}
    ordered.update((n, f) for n, f in SPARK_QUERIES.items() if n not in ordered)
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(ordered)
    sql_ordered = {n: ORACLE_SQL[n] for n in SPARK_QUERIES if n in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(sql_ordered)


_apply_priority_order()
