from crypto_price_tracker_with_etl_dashboard_spark.plans.inspect import (
    executed_plan,
    plan_summary,
)

__all__ = ["executed_plan", "plan_summary"]
