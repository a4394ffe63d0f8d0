"""Physical-plan introspection: the facts the 100 TB story is argued
from (shuffle count, pushdown, codegen coverage, join strategies),
extracted as data instead of eyeballed from `.explain()` output.

Used by the plan-shape regression tests (tests/test_plans.py,
tests/test_asof.py, tests/test_skew_bucketing.py) and for iterating
on a query until its plan is the one you'd want on a cluster:

    >>> plan_summary(df)
    {'exchanges': 1, 'broadcast_joins': 2, 'sort_merge_joins': 0, ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    """Plan-shape facts for assertions and tuning."""
    plan = executed_plan(df)
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        "hash_exchanges": plan.count("Exchange hashpartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "wholestage_codegen_spans": len(re.findall(r"WholeStageCodegen \(\d+\)", plan)),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (struct<[^\n]*)", plan),
    }
