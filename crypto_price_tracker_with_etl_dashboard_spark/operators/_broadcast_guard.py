"""Size guard for the iterative graph family's O(nodes) broadcasts.

PageRank / HITS / LPA / the modularity tag join all broadcast a
per-node score/label table onto the one cached edge list each round —
the right plan while nodes ≪ edges (the usual web/trade-graph shape:
the 100 TB side is edges, and the node table is GBs, not TBs).  But a
FORCED ``F.broadcast`` hint has no escape hatch: at billions of nodes
it would OOM the driver and executors rather than degrade.  This is
the ``MAX_BAND_BUCKET`` treatment from ``functions/dedup.py`` applied
to broadcasts: past a node-count threshold the hint is DROPPED — the
join still runs, planned by Catalyst/AQE (sort-merge or shuffled-hash
on the equijoin keys; at production scale the bucketed co-located
join is the intended physical shape) — and the decision is recorded
in an observable per-application log so a binding guard is visible
to tests and operators instead of silent.

Scope: the ITERATIVE family (PageRank / HITS / LPA / the modularity
tag join), where a forced hint re-ships the O(nodes) table every
round and an OOM would be systematic.  One-shot analytics joins that
broadcast a derived O(nodes) side exactly once (trade_assortativity's
degree attach, trade_neighbor_jaccard's size attach) keep their plain
hints: guarding them would cost an extra count job per query for a
single-shot risk AQE's runtime re-plan already mitigates, and at the
node counts where the guard binds those queries' aggregates dominate
anyway.

Callers pass the exact node count when it is already materialized
(PageRank needs ``nodes.count()`` for its teleport constants anyway)
or a FREE upper bound derived from an already-materialized count
(LPA uses |nbr| = 2·|edges|, HITS and the modularity tag join use
2·|edges| — zero extra jobs) — a conservative bound only costs the
compile-time hint, which AQE's runtime size check re-adds when the
built side turns out small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A (node, score, aux) broadcast row costs ~100 B in the JVM
# HashedRelation (object + hash-table overhead on ~24 B of data), so
# 10M nodes ≈ 1 GB resident per executor — the practical ceiling for
# a hint that every round of a 3-8 round recursion re-ships.  Far
# above the node counts at every certified SF (sf0.01/sf0.1/sf1
# graphs top out at ~1e5 nodes), so oracle parity is unaffected.
MAX_BROADCAST_NODES = 10_000_000

# applicationId -> list of {op, n_nodes, limit, hinted} decision
# records (appId keying: id(session) values are reused after GC —
# the _BANDED_CACHE convention).  Bounded two ways (r10 ADVICE): on
# insert, records for OTHER application ids are evicted (the
# _HITS_CACHE / _LPA_CACHE pop-on-entry convention — a finished
# application's log would otherwise leak for the process lifetime),
# and the live application's list is capped at _GUARD_LOG_MAX records
# (oldest dropped), so a long-lived driver looping pagerank/hits/lpa
# holds O(1) log memory without a manual clear_guard_log.
_GUARD_LOG: dict[str, list[dict]] = {}
_GUARD_LOG_MAX = 4096


def guarded_broadcast(
    df: DataFrame, n_nodes: int, *, op: str, limit: int | None = None
) -> DataFrame:
    """``F.broadcast(df)`` while ``n_nodes`` (exact count or upper
    bound) fits under the threshold; past it, return ``df`` unhinted
    and log the bind.  ``op`` names the call site in the log."""
    lim = MAX_BROADCAST_NODES if limit is None else limit
    hinted = n_nodes <= lim
    app_id = df.sparkSession.sparkContext.applicationId
    for stale in [k for k in _GUARD_LOG if k != app_id]:
        _GUARD_LOG.pop(stale, None)
    records = _GUARD_LOG.setdefault(app_id, [])
    records.append(
        {"op": op, "n_nodes": int(n_nodes), "limit": int(lim), "hinted": hinted}
    )
    del records[:-_GUARD_LOG_MAX]
    return F.broadcast(df) if hinted else df


def guard_log(spark) -> list[dict]:
    """Decision records for this Spark application (newest last)."""
    return list(_GUARD_LOG.get(spark.sparkContext.applicationId, []))


def clear_guard_log(spark) -> None:
    _GUARD_LOG.pop(spark.sparkContext.applicationId, None)
