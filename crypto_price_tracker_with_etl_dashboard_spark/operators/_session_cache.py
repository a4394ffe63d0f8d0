"""Session-scoped, semantic-plan-keyed DataFrame cache (r12).

Several operators and query families derive the SAME intermediate
from the same cached input in one Spark application — the mirrored
neighbor table that LPA, k-core, and the coreness decomposition all
build from the co-occurrence edge list, the LSH banded-signature
table ~10 doc_* queries build from the corpus.  Entries are matched
by Catalyst's ``sameResult`` (canonicalized semantic plan equality —
the exact check Spark's own CacheManager uses to de-duplicate cached
relations), so expression-id drift between invocations never defeats
the match and a call with different parameters or a different input
simply misses.

Caches are keyed per applicationId and die with the application:
nothing persists across bench or driver runs.  Each cache dict is
capped (oldest entry unpersisted first) so parameter sweeps cannot
stack corpus-sized tables.  Stale-application entries are dropped
WITHOUT unpersist — their SparkContext is stopped, the JVM cache
died with the application, only the Python handles remain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_ENTRIES = 3


def session_plan_cache(
    cache: dict[str, list[tuple[object, DataFrame]]],
    df: DataFrame,
    max_entries: int = DEFAULT_MAX_ENTRIES,
) -> DataFrame:
    """Return the session-cached materialization of ``df`` — the
    stored entry whose analyzed plan ``sameResult``-matches, else
    ``df.cache()`` newly stored (evicting beyond ``max_entries``,
    oldest first)."""
    app_id = df.sparkSession.sparkContext.applicationId
    for stale in [k for k in cache if k != app_id]:
        cache.pop(stale, None)
    entries = cache.setdefault(app_id, [])
    new_plan = df._jdf.queryExecution().analyzed()
    for plan, cached in entries:
        if plan.sameResult(new_plan):
            return cached
    df = df.cache()
    entries.append((new_plan, df))
    while len(entries) > max_entries:
        _, old = entries.pop(0)
        old.unpersist()
    return df


# The shared mirrored neighbor table (a, b) — one row per edge
# DIRECTION — that label propagation, k-core, and the coreness
# decomposition all build identically from the same cached edge list
# (including the co-located variants, which key separate entries).
MIRROR_CACHE: dict[str, list[tuple[object, DataFrame]]] = {}
