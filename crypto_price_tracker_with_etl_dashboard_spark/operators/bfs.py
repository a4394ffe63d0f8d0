"""Multi-hop breadth-first search: shortest hop counts from a source
node over a directed edge list.

The reachability question PageRank (influence) and connected
components (membership) don't answer: HOW FAR is every node from a
given origin — supply-chain blast radius, referral depth, fraud-ring
proximity.

Execution shape: classic frontier iteration with a visited-set
anti-join.  Each of the ``max_hops`` rounds is one join (frontier
against the edge list) + one distinct — the frontier stays a set of
node ids, never paths, so per-round cost is bounded by |edges
touched| and the state by |nodes|, regardless of how many distinct
paths exist (a path-enumerating recursion explodes combinatorially
on dense graphs).  The visited anti-join keeps re-expansion of
already-settled nodes out of later rounds; it cannot change results
— a node re-expanded at level k only re-derives neighbors first
reachable at <= k+1 — so the oracle can use the simpler unrolled
level expansion with MIN(level) and still match bit-for-bit.

Frontier and visited sets are localCheckpoint-ed per round: the
lineage of round k otherwise nests k copies of the edge join, and a
failure-recovery replay would be quadratic (same eager-truncation
rationale as operators/components.py).  Checkpoints are LAZY since
r12: the plan is truncated immediately either way, and the round's
own isEmpty / the next round's action materializes the persisted
partitions — so each BFS round costs one job instead of three, and
the fixed-round relaxations (bellman_ford, widest_path) run as ONE
job whose stages chain through the per-round checkpoint boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(edges: DataFrame, source: int, max_hops: int) -> DataFrame:
    """Shortest hop count (0..max_hops) from ``source`` to every
    reachable node.  ``edges`` has BIGINT columns (src, dst); returns
    (node, hops) with one row per reached node."""
    if max_hops < 1:
        raise ValueError(f"bfs_hops needs max_hops >= 1, got {max_hops}")
    spark = edges.sparkSession
    e = edges.select("src", "dst")
    frontier = spark.createDataFrame([(source,)], "node bigint").localCheckpoint(
        eager=True
    )
    visited = frontier
    levels = [frontier.select("node", F.lit(0).alias("hops"))]
    for k in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt.select("node", F.lit(k).alias("hops")))
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def sql_bfs_hops(edges_cte: str, source: int, max_hops: int) -> str:
    """DuckDB mirror of :func:`bfs_hops`: unrolled per-level DISTINCT
    frontier expansion, shortest distance as MIN(level).  Levels may
    re-derive already-visited nodes (no anti-join in SQL's unrolled
    form) — the MIN collapses them to the identical first-reach hop
    count.  ``edges_cte`` supplies `edges(src, dst)` CTEs (no WITH
    keyword, trailing comma excluded)."""
    ctes = [edges_cte, f"f0 AS (SELECT CAST({source} AS BIGINT) AS node)"]
    unions = ["SELECT node, 0 AS hops FROM f0"]
    for k in range(1, max_hops + 1):
        ctes.append(
            f"f{k} AS (SELECT DISTINCT e.dst AS node"
            f" FROM edges e JOIN f{k - 1} f ON e.src = f.node)"
        )
        unions.append(f"SELECT node, {k} AS hops FROM f{k}")
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    SELECT node, MIN(hops) AS hops FROM ("
        + " UNION ALL ".join(unions)
        + ") GROUP BY node"
    )


def multi_bfs_hops(
    edges: DataFrame, sources: list[int], max_hops: int
) -> DataFrame:
    """Shortest hop counts from EVERY source in ``sources`` in one
    synchronized frontier sweep: frontier rows are (root, node)
    pairs, so K sources cost one shared edge scan per round instead
    of K sequential :func:`bfs_hops` jobs — the batch shape
    landmark/pivot centrality estimators use (Eppstein & Wang,
    SODA'01 pick random pivots exactly so K stays fixed as |V|
    grows).  Visited-set anti-join and per-round localCheckpoint
    carry over unchanged, now keyed on (root, node); state is
    O(K * reached), never paths.

    Returns (root, node, hops) with one row per (source, reached
    node), hops in 0..max_hops."""
    if max_hops < 1:
        raise ValueError(f"multi_bfs_hops needs max_hops >= 1, got {max_hops}")
    if not sources:
        raise ValueError("multi_bfs_hops needs at least one source")
    spark = edges.sparkSession
    e = edges.select("src", "dst")
    frontier = spark.createDataFrame(
        [(s, s) for s in sources], "root bigint, node bigint"
    ).localCheckpoint(eager=True)
    visited = frontier
    levels = [frontier.select("root", "node", F.lit(0).alias("hops"))]
    for k in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt.select("root", "node", F.lit(k).alias("hops")))
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def sql_multi_bfs_hops(edges_cte: str, sources: list[int], max_hops: int) -> str:
    """DuckDB mirror of :func:`multi_bfs_hops`: per-level DISTINCT
    (root, node) frontier expansion unrolled ``max_hops`` times,
    shortest distance as MIN(level) — the same re-derivation argument
    as :func:`sql_bfs_hops`, per root."""
    seed = ", ".join(
        f"(CAST({s} AS BIGINT), CAST({s} AS BIGINT))" for s in sources
    )
    ctes = [
        edges_cte,
        f"f0 AS (SELECT * FROM (VALUES {seed}) AS t(root, node))",
    ]
    unions = ["SELECT root, node, 0 AS hops FROM f0"]
    for k in range(1, max_hops + 1):
        ctes.append(
            f"f{k} AS (SELECT DISTINCT f.root, e.dst AS node"
            f" FROM edges e JOIN f{k - 1} f ON e.src = f.node)"
        )
        unions.append(f"SELECT root, node, {k} AS hops FROM f{k}")
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    SELECT root, node, MIN(hops) AS hops FROM ("
        + " UNION ALL ".join(unions)
        + ") GROUP BY root, node"
    )


def bellman_ford(edges: DataFrame, source: int, rounds: int) -> DataFrame:
    """Single-source cheapest-path costs over positive INTEGER edge
    weights, by ``rounds`` synchronous relaxation rounds (Bellman &
    Ford, 1958): dist_k(v) = min(dist_{k-1}(v), min over edges u->v
    of dist_{k-1}(u) + w).  After k rounds every node whose cheapest
    path uses <= k edges carries its final cost — the weighted
    generalization of :func:`bfs_hops` (which this reproduces when
    every w = 1).

    BFS's visited-set pruning is NOT sound here: a node settled at
    hop k can still get CHEAPER via a longer path, so every round
    relaxes the full current distance table.  Each round is one join
    (distances against the edge list) + one MIN aggregate — state is
    O(reached nodes), never paths, and integer costs make every
    partial distance engine-exact, so an unrolled per-round oracle
    matches bit-for-bit even when ``rounds`` stops short of
    convergence.  The distance table localCheckpoints per round
    (lineage truncation, as in bfs_hops).

    ``edges`` has BIGINT (src, dst, w), w >= 1; returns (node, cost).
    """
    if rounds < 1:
        raise ValueError(f"bellman_ford needs rounds >= 1, got {rounds}")
    spark = edges.sparkSession
    e = edges.select("src", "dst", "w")
    dist = spark.createDataFrame(
        [(source, 0)], "node bigint, cost bigint"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=False)
        )
    return dist


def sql_bellman_ford(edges_cte: str, source: int, rounds: int) -> str:
    """DuckDB mirror of :func:`bellman_ford`: the same synchronous
    relaxation unrolled round by round (d0..dN CTEs, each O(nodes)
    after its GROUP BY — never a path enumeration)."""
    ctes = [
        edges_cte,
        f"d0 AS (SELECT CAST({source} AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"d{k} AS (SELECT node, MIN(cost) AS cost FROM ("
            f"SELECT node, cost FROM d{k - 1}"
            f" UNION ALL "
            f"SELECT e.dst AS node, d.cost + e.w AS cost"
            f" FROM edges e JOIN d{k - 1} d ON e.src = d.node"
            f") GROUP BY node)"
        )
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT node, cost FROM d{rounds}"


_WIDEST_INF = (1 << 62)  # source sentinel: wider than any real edge sum


def widest_path(edges: DataFrame, source: int, rounds: int) -> DataFrame:
    """Single-source WIDEST (maximum-bottleneck) path capacities over
    positive INTEGER edge capacities, by ``rounds`` synchronous
    relaxation rounds: cap_k(v) = max(cap_{k-1}(v), max over edges
    u->v of min(cap_{k-1}(u), w)).  The (max, min) semiring swap of
    :func:`bellman_ford` — the logistics question "what is the widest
    route?" instead of "what is the cheapest?".

    Like Bellman-Ford (and unlike BFS), settled nodes must keep
    relaxing: a longer path can be WIDER.  Integer capacities make
    every partial value engine-exact, so the unrolled oracle matches
    bit-for-bit short of convergence.  The source carries the
    _WIDEST_INF sentinel internally and is dropped from the result
    (its own bottleneck is undefined).

    ``edges`` has BIGINT (src, dst, w), w >= 1; returns (node, width).
    """
    if rounds < 1:
        raise ValueError(f"widest_path needs rounds >= 1, got {rounds}")
    spark = edges.sparkSession
    e = edges.select("src", "dst", "w")
    cap = spark.createDataFrame(
        [(source, _WIDEST_INF)], "node bigint, width bigint"
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = e.join(cap.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            F.least(F.col("width"), F.col("w")).alias("width"),
        )
        cap = (
            cap.unionByName(relaxed)
            .groupBy("node")
            .agg(F.max("width").alias("width"))
            .localCheckpoint(eager=False)
        )
    return cap.filter(F.col("node") != source)


def sql_widest_path(edges_cte: str, source: int, rounds: int) -> str:
    """DuckDB mirror of :func:`widest_path`: the same (max, min)
    relaxation unrolled round by round."""
    ctes = [
        edges_cte,
        f"c0 AS (SELECT CAST({source} AS BIGINT) AS node,"
        f" CAST({_WIDEST_INF} AS BIGINT) AS width)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"c{k} AS (SELECT node, MAX(width) AS width FROM ("
            f"SELECT node, width FROM c{k - 1}"
            f" UNION ALL "
            f"SELECT e.dst AS node, LEAST(c.width, e.w) AS width"
            f" FROM edges e JOIN c{k - 1} c ON e.src = c.node"
            f") GROUP BY node)"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, width FROM c{rounds} WHERE node <> {source}"
    )
