from crypto_price_tracker_with_etl_dashboard_spark.functions import text, dedup, similarity

__all__ = ["text", "dedup", "similarity"]
