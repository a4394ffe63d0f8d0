from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import dsum, davg
from crypto_price_tracker_with_etl_dashboard_spark.operators.latest import latest_snapshot
from crypto_price_tracker_with_etl_dashboard_spark.operators.history import history_slice
from crypto_price_tracker_with_etl_dashboard_spark.operators.dashboard import (
    topk_with_other,
    market_share,
    display_snapshot,
    distinct_symbols,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.asof import asof_join
from crypto_price_tracker_with_etl_dashboard_spark.operators.range_join import (
    bucketed_range_join,
)

__all__ = [
    "dsum",
    "davg",
    "latest_snapshot",
    "history_slice",
    "topk_with_other",
    "market_share",
    "display_snapshot",
    "distinct_symbols",
    "asof_join",
    "bucketed_range_join",
]
