"""r8 debut plan audit: executedPlan sweep over all 20 r8 debuts +
batch 60, flagging cartesian products, sort-merge joins on paths that
should broadcast, Python eval nodes, and counting exchanges.

Usage: python tools/audit_plans_r8.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

NAMES = [
    # r8 debuts (20)
    "events_top_paths", "events_markov", "doc_bigram_topk",
    "events_grouping_sets", "events_histogram", "emb_dim_stats",
    "prices_trend", "doc_keep_best_dedup", "doc_ngram_lm_hit_rate",
    "events_hll_rolling_wau", "media_frame_dups", "events_abandonment",
    "doc_dup_transitivity", "lineitem_join_blowup",
    "events_triangles", "doc_fuzzy_join",
    "doc_lsh_bucket_profile", "prices_overnight_intraday",
    "prices_vol_signature", "emb_pq_subspace_distortion",
    # batch 60 (r8-built)
    "doc_eval_contamination", "doc_weighted_sample",
    "events_active_days_histogram", "events_entry_exit",
]

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
    spark = get_spark("plan-audit-r8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import queries

    qs = queries()
    for name in NAMES:
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
