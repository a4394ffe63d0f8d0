"""End-to-end experimentation pipeline — the analysis stack an
A/B platform runs over the events stream, in the order a careful
experimenter applies it:

  1. assignment QA: the row-level split-leakage report — proof of
     WHY arms must be assigned at the entity level (the same users
     would otherwise appear in both arms)
  2. readout: the naive two-proportion z-test on entity-level arms
     (events_ab_lift's machinery)
  3. variance reduction: the CUPED covariate-adjusted readout —
     theta, adjusted diff, and how much variance the pre-period
     covariate removed
  4. guardrails: hour-of-day seasonality profile and the robust MAD
     value-outlier count — the checks that catch a broken logging
     pipeline masquerading as a treatment effect

Every stage is certified piecewise by driver-oracle rows
(events_split_leakage, events_ab_lift, events_cuped_lift,
events_seasonality, events_robust_outliers); this module is the
composition, smoke-tested in tests/test_examples.py.

Run:  python examples/experimentation_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the per-stage summary).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_experiment_analysis(spark, sf_dir: str) -> dict:
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_ab_lift,
        q_events_cuped_lift,
        q_events_robust_outliers,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        q_events_split_leakage,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_seasonality,
    )

    stats: dict = {}

    # 1. assignment QA
    leaks = q_events_split_leakage(spark, sf_dir)
    stats["leaky_users"] = leaks.count()

    # 2. naive readout
    ab = q_events_ab_lift(spark, sf_dir).collect()[0]
    stats["n_a"], stats["n_b"] = ab["n_a"], ab["n_b"]
    stats["rate_a"], stats["rate_b"] = ab["rate_a"], ab["rate_b"]
    stats["z_stat"] = ab["z_stat"]

    # 3. CUPED
    cuped = q_events_cuped_lift(spark, sf_dir).collect()[0]
    stats["theta"] = cuped["theta"]
    stats["diff_raw"] = cuped["diff_raw"]
    stats["diff_adj"] = cuped["diff_adj"]
    stats["var_reduction"] = cuped["var_reduction"]

    # 4. guardrails
    seasonality = q_events_seasonality(spark, sf_dir)
    stats["seasonality_cells"] = seasonality.count()
    stats["value_outliers"] = q_events_robust_outliers(spark, sf_dir).count()
    return stats


def main(sf_dir: str) -> None:
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    spark = get_spark("experimentation-example")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run_experiment_analysis(spark, sf_dir).items():
        print(f"{k:18}: {v}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
