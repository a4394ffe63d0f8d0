from crypto_price_tracker_with_etl_dashboard_spark.streaming.pipeline import (
    run_ingest_stream,
    snapshot_for_push,
)
from crypto_price_tracker_with_etl_dashboard_spark.streaming.sessionize import (
    streaming_sessionize,
)
from crypto_price_tracker_with_etl_dashboard_spark.streaming.windows import ohlc_candles
from crypto_price_tracker_with_etl_dashboard_spark.streaming.joins import (
    dedup_documents_stream,
    dedup_stream,
    interval_join_streams,
)

__all__ = [
    "run_ingest_stream",
    "snapshot_for_push",
    "streaming_sessionize",
    "ohlc_candles",
    "dedup_documents_stream",
    "dedup_stream",
    "interval_join_streams",
]
