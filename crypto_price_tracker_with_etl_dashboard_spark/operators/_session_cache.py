"""Session-scoped, semantic-plan-keyed DataFrame cache (r12).

Several operators and query families derive the SAME intermediate
from the same cached input in one Spark application — the mirrored
neighbor table that LPA, k-core, and the coreness decomposition all
build from the co-occurrence edge list, the LSH banded-signature
table ~10 doc_* queries build from the corpus, the pagerank-family
edge/node/out-weight tables trade_pagerank and trade_ppr both build
(r13), and the capped degree-oriented edge list triangle counting
and the k-truss peel both build (r13).  Entries are matched by
Catalyst's ``sameResult`` (canonicalized semantic plan equality —
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

Materialize-on-miss (r13): callers that need the cached table
populated before a multi-branch first action (the "first-action
branches recompute" hazard triangles.py documents) pass
``materialize=True``; the count job runs ONLY when the entry is
newly cached — a hit returns with zero jobs, where the pre-r13
convention (``session_plan_cache(...)`` followed by an unconditional
``.count()``) paid one redundant job per hit.  The count value is
memoized on the DataFrame object (``_graft_count``) so callers that
need the scalar (pagerank's teleport constants, HITS' guard bound)
read it for free on a hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_ENTRIES = 3


def cached_count(df: DataFrame) -> int:
    """``df.count()`` memoized on the DataFrame OBJECT — safe exactly
    when the same (cached, immutable-input) DataFrame object is
    re-consulted, e.g. the per-application edge tables the query
    modules hold in their session caches.  The scalar dies with the
    Python handle; nothing persists across runs."""
    n = getattr(df, "_graft_count", None)
    if n is None:
        n = df.count()
        df._graft_count = n
    return n


def session_plan_cache(
    cache: dict[str, list[tuple[object, DataFrame]]],
    df: DataFrame,
    max_entries: int = DEFAULT_MAX_ENTRIES,
    materialize: bool = False,
) -> DataFrame:
    """Return the session-cached materialization of ``df`` — the
    stored entry whose analyzed plan ``sameResult``-matches, else
    ``df.cache()`` newly stored (evicting beyond ``max_entries``,
    oldest first).  With ``materialize=True`` a newly cached entry is
    populated with one count job (memoized on the object, see
    :func:`cached_count`); hits run zero jobs."""
    app_id = df.sparkSession.sparkContext.applicationId
    for stale in [k for k in cache if k != app_id]:
        cache.pop(stale, None)
    entries = cache.setdefault(app_id, [])
    new_plan = df._jdf.queryExecution().analyzed()
    for plan, cached in entries:
        if plan.sameResult(new_plan):
            if materialize:
                cached_count(cached)
            return cached
    df = df.cache()
    entries.append((new_plan, df))
    while len(entries) > max_entries:
        _, old = entries.pop(0)
        old.unpersist()
    if materialize:
        cached_count(df)
    return df


# The shared mirrored neighbor table (a, b) — one row per edge
# DIRECTION — that label propagation, k-core, and the coreness
# decomposition all build identically from the same cached edge list
# (including the co-located variants, which key separate entries).
MIRROR_CACHE: dict[str, list[tuple[object, DataFrame]]] = {}

# The shared capped, degree-oriented edge list (src, dst, ddeg) plus
# its degree table — triangle counting and the k-truss peel build the
# identical orientation from the same cached co-occurrence edge list
# (r13; any fixed total node order enumerates each triangle exactly
# once, so k-truss adopting the triangle orientation changes no
# output — see operators/ktruss.py).
ORIENT_CACHE: dict[str, list[tuple[object, DataFrame]]] = {}
