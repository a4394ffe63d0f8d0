"""k-core decomposition (bounded peel) over an undirected edge list.

The density filter graph pipelines run before expensive per-node
work: the k-core is the maximal subgraph where every node keeps
degree >= k, found by iteratively peeling nodes of degree < k
(Matula & Beck, JACM 1983 — peeling converges because removal only
ever lowers degrees).  Spam/bot rings and tight communities survive;
tendrils and one-off co-occurrences fall away.

Scale shape (the LPA envelope, r11 verdict finding #1): the mirrored
neighbor table (a, b) — one row per edge DIRECTION — is built once,
cached, and each round makes exactly ONE join: semi-join nbr on ``b``
against the O(nodes) alive set, then a (a -> count) hash aggregate
with map-side partials.  The alive side goes through
``guarded_broadcast`` — broadcast while the node count fits under
MAX_BROADCAST_NODES, an observable ``shuffle_hash`` swap past it —
and when the guard will bind, the cached mirror is laid out
hash-partitioned on ``b`` ONCE (``colocate_for_guarded_joins``), so
every round's join streams it with zero edge-side Exchange.  The
bound passed to the guard is the already-materialized per-round
``n_alive`` count — kcore counts the alive set every round for its
convergence check anyway, so the guard costs zero extra jobs.

Single-join equivalence (why one semi-join replaces the previous
two-endpoint filter): alive sets shrink monotonically, and a node
that died at round s had fewer than k alive neighbors THEN — with a
shrinking alive set its alive-neighbor count only shrinks further, so
counting alive neighbors for ALL nodes and filtering ``>= k``
excludes every dead node automatically.  Per round the surviving set
is identical to filtering edges on both endpoints, row for row (the
fixpoint degrees too), so the unrolled DuckDB oracle is unchanged.

The peel stops at the FIRST round that removes nothing (one count()
action per round, same driver-scalar discipline as
connected_components' convergence check); round count is bounded by
the peel depth, which is tiny on real degree distributions (2-4
here).  The DuckDB oracle unrolls a fixed number of rounds — valid
because peeling is monotone: once converged, further rounds are
no-ops, so an R-round unroll equals the fixpoint whenever
convergence happens within R (asserted by the operator's
``max_rounds`` raise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators._broadcast_guard import (
    colocate_for_guarded_joins,
    evict_stale_app_entries,
    guarded_broadcast,
    hint_will_fit,
)


# applicationId -> cached DataFrames from the previous kcore call
# (the _LPA_CACHE convention): popped and unpersisted on the next
# call under the SAME application; entries for OTHER application ids
# are dropped on entry WITHOUT unpersist (their SparkContext is
# stopped — the JVM cache died with the application, only the Python
# handles would leak).
_KCORE_CACHE: dict[str, list] = {}


def _degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from an undirected u<v edge list: one explode of
    both endpoints + a partial-agged count (NOT a unionByName of two
    projections — each union branch would re-read the upstream)."""
    return (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def kcore(edges: DataFrame, k: int, max_rounds: int = 20) -> DataFrame:
    """Nodes of the k-core with their in-core degree.

    Peels until stable; raises if ``max_rounds`` passes without
    convergence (so a caller whose oracle unrolls R rounds can trust
    the fixpoint was reached within R).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    app_id = edges.sparkSession.sparkContext.applicationId
    evict_stale_app_entries(_KCORE_CACHE, app_id)
    for prev in _KCORE_CACHE.pop(app_id, []):
        prev.unpersist()
    held: list[DataFrame] = []
    # materialize the edge projection ONCE (the triangles/LPA edge
    # discipline): an uncached input would otherwise re-run its whole
    # upstream build on every round's action.  Skip the cache when the
    # CALLER already cached the input (the ktruss convention, r11
    # ADVICE): re-caching an identical plan warns and risks dropping a
    # sibling's cache entry on the next call's unpersist.
    e = edges.select("u", "v")
    if not (edges.storageLevel.useMemory or edges.storageLevel.useDisk):
        e = e.cache()
        held.append(e)
    # initial alive set from full-graph degrees; its count doubles as
    # the broadcast-guard bound for EVERY round (alive only shrinks),
    # already materialized for the convergence check — zero extra jobs
    alive = (
        _degrees(e).filter(F.col("deg") >= k).select("node")
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    # mirrored neighbor table, one row per edge direction (the LPA
    # shape: 2x the edge rows, but ONE join per round instead of two
    # chained endpoint semi-joins — and one co-located layout, not
    # the dual layout the chained form would need above-threshold)
    nbr = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    if not hint_will_fit(n_alive):
        # the guard will drop the per-round broadcast: lay the cached
        # mirror out hash-partitioned on the per-round join key ONCE,
        # so every round's shuffle_hash semi-join streams it from the
        # cache with zero edge-side Exchange (only the O(nodes) alive
        # set shuffles; InMemoryTableScan preserves the layout —
        # the LPA/pagerank discipline)
        nbr = colocate_for_guarded_joins(nbr, "b")
    nbr = nbr.cache()
    nbr.count()  # materializes the cached layout before the rounds
    held.append(nbr)
    _KCORE_CACHE[app_id] = held
    for _ in range(max_rounds):
        al = alive.select(F.col("node").alias("__kb"))
        deg = (
            nbr.join(
                guarded_broadcast(al, n_alive, op="kcore"),
                F.col("b") == F.col("__kb"),
                "left_semi",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.count("*").alias("deg"))
        )
        new_alive = (
            deg.filter(F.col("deg") >= k).select("node")
            .localCheckpoint(eager=True)
        )
        n_new = new_alive.count()
        if n_new == n_alive:
            return (
                deg.filter(F.col("deg") >= k).select("node", "deg")
                .localCheckpoint(eager=True)
            )
        alive, n_alive = new_alive, n_new
    raise RuntimeError(f"k-core peel did not converge in {max_rounds} rounds")


def sql_kcore(edges_cte: str, k: int, rounds: int) -> str:
    """DuckDB mirror: ``rounds`` unrolled peel steps over the edge
    CTE (which must end with an ``edges(u, v)`` relation).  Valid
    whenever the true peel converges within ``rounds`` — the Spark
    operator raises otherwise."""
    # edges_m / MATERIALIZED: every round references the edge list
    # twice — without the hint DuckDB inlines the whole upstream CTE
    # chain into each reference and the unroll goes quadratic in
    # wall-clock (measured 79s -> <1s at sf0.01)
    parts = [edges_cte.rstrip().rstrip(",")]
    parts.append("edges_m AS MATERIALIZED (SELECT u, v FROM edges)")
    prev = "alive0"
    parts.append(
        """alive0 AS MATERIALIZED (
      SELECT node FROM (
        SELECT unnest([u, v]) AS node FROM edges_m
      ) GROUP BY node HAVING COUNT(*) >= {k}
    )""".format(k=k)
    )
    for r in range(1, rounds + 1):
        parts.append(
            f"""deg{r} AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT unnest([u, v]) AS node FROM edges_m
        WHERE u IN (SELECT node FROM {prev})
          AND v IN (SELECT node FROM {prev})
      ) GROUP BY node
    ),
    alive{r} AS MATERIALIZED (SELECT node, deg FROM deg{r} WHERE deg >= {k})"""
        )
        prev = f"alive{r}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, deg FROM alive{rounds}"
    )
