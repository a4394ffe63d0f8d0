"""Debut plan audit: executedPlan sweep flagging cartesian products,
sort-merge joins on paths that should broadcast, Python eval nodes,
and counting distinct exchange nodes.

Usage: python tools/audit_plans.py [sf_dir] [query ...]

With no query names, audits the registry's current NEW_THIS_ROUND
debuts — the per-round default (the r8 run also covered batch 60 by
listing its four names explicitly; paste the verbatim output into
BASELINE.md's round evidence section).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

MARKS = [
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "Exchange",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        from crypto_price_tracker_with_etl_dashboard_spark.queries import (
            NEW_THIS_ROUND,
        )

        names = list(NEW_THIS_ROUND)
    spark = get_spark("plan-audit", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import queries

    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        df.count()  # force AQE final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AdaptiveSparkPlan.toString() echoes "== Initial Plan ==" after
        # "== Final Plan ==" for every adaptive subtree — count only the
        # final sections, and don't count ReusedExchange as Exchange.
        plan = "\n".join(
            seg.split("== Initial Plan ==")[0] for seg in plan.split("== Final Plan ==")
        )
        plan = plan.replace("ReusedExchange", "Reused_")
        counts = {m: len(re.findall(m, plan)) for m in MARKS}
        # A shared DataFrame subtree prints its Exchange at every use
        # site with the SAME plan_id (one physical node, executed once
        # under AQE stage reuse) — count distinct exchange nodes.
        counts["Exchange"] = len(
            set(re.findall(r"\bExchange [^\n]*plan_id=(\d+)", plan))
        )
        # BroadcastNestedLoopJoin double-counts Cartesian-ish marks:
        flags = " ".join(f"{m}={c}" for m, c in counts.items() if c)
        print(f"{name}: {flags or 'clean'}")


if __name__ == "__main__":
    main()
