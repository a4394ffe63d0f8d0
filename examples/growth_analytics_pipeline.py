"""End-to-end product/growth analytics pipeline — the weekly growth
review a product team runs over the events stream, in reading order:

  1. engagement depth: DAU/MAU stickiness and the active-days
     (L28 power-user) histogram — how habitual is usage?
  2. acquisition & retention: weekly cohort retention and the
     new/retained/resurrected/churned growth-accounting ledger —
     where do the users come from and do they stay?
  3. session behavior: the entry/exit matrix (which event type opens
     and closes each 30-minute session) and the bounce rate — what
     do sessions actually look like?
  4. conversion: the ordered signup→view→purchase funnel and the
     view-to-purchase abandonment rate — where does intent leak?

Every stage is certified piecewise by driver-oracle rows
(events_dau_mau, events_active_days_histogram,
events_retention_cohorts, events_growth_accounting,
events_entry_exit, events_bounce_rate, events_funnel,
events_abandonment); this module is the composition, smoke-tested
in tests/test_examples.py.  The entry/exit stage also has a live
stateful streaming twin (streaming/entry_exit.py).

Run:  python examples/growth_analytics_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the per-stage summary).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_growth_review(spark, sf_dir: str) -> dict:
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_abandonment,
        q_events_active_days_histogram,
        q_events_bounce_rate,
        q_events_entry_exit,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_dau_mau,
        q_events_funnel,
        q_events_growth_accounting,
        q_events_retention_cohorts,
    )

    out: dict = {}

    # 1. engagement depth
    out["median_dau_mau_ppm"] = (
        q_events_dau_mau(spark, sf_dir)
        .agg(F.expr("CAST(median(stickiness_ppm) AS BIGINT)").alias("m"))
        .first()["m"]
    )
    hist = q_events_active_days_histogram(spark, sf_dir).collect()
    out["power_users_10d_plus"] = sum(
        r["n_users"] for r in hist if r["active_days"] >= 10
    )

    # 2. acquisition & retention
    out["cohort_rows"] = q_events_retention_cohorts(spark, sf_dir).count()
    ga = q_events_growth_accounting(spark, sf_dir).collect()
    out["growth_weeks"] = len({r["week"] for r in ga})
    out["resurrected_total"] = sum(r["resurrected"] for r in ga)

    # 3. session behavior
    matrix = q_events_entry_exit(spark, sf_dir).collect()
    out["top_entry_exit"] = (
        (matrix[0]["entry_type"], matrix[0]["exit_type"]) if matrix else None
    )
    out["diagonal_session_share_ppm"] = (
        sum(r["share_ppm"] for r in matrix if r["entry_type"] == r["exit_type"])
        if matrix
        else 0
    )
    bounce = q_events_bounce_rate(spark, sf_dir).collect()
    out["bounce_days"] = len(bounce)

    # 4. conversion
    funnel = q_events_funnel(spark, sf_dir).collect()
    out["funnel_stages"] = len(funnel)
    ab = q_events_abandonment(spark, sf_dir).collect()
    if ab:
        views = sum(r["n_views"] for r in ab)
        conv = sum(r["n_converted"] for r in ab)
        out["overall_abandon_ppm"] = (views - conv) * 1_000_000 // views
    else:
        out["overall_abandon_ppm"] = None
    return out


def main(sf_dir: str) -> None:
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    spark = get_spark("growth-analytics-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run_growth_review(spark, sf_dir).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
