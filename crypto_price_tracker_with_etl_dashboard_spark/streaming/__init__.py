from crypto_price_tracker_with_etl_dashboard_spark.streaming.pipeline import (
    run_ingest_stream,
    snapshot_for_push,
)

__all__ = ["run_ingest_stream", "snapshot_for_push"]
