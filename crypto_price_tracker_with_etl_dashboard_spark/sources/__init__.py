from crypto_price_tracker_with_etl_dashboard_spark.sources.tables import (
    fan_out,
    load_table,
    prices_from_events,
    PRICES_CTE_SQL,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources.ingest import (
    validate_and_normalize,
    coingecko_rows_to_df,
)

__all__ = [
    "fan_out",
    "load_table",
    "prices_from_events",
    "PRICES_CTE_SQL",
    "validate_and_normalize",
    "coingecko_rows_to_df",
]
