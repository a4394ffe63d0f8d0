"""Forest / hierarchy resolution: every node's root ancestor and
depth from a (child, parent) relation — the transitive-traversal
primitive behind org charts, BOM explosion, category trees, and
reply-thread flattening.  The fourth iterative graph operator
(components, PageRank, LPA are the others), and the one whose DuckDB
twin is a REAL ``WITH RECURSIVE`` — a differential test of genuine
recursion, not an unrolled fixed-iteration chain.

Algorithm: pointer doubling.  State is (node, anc, depth) seeded
with each node's parent (roots point at themselves, depth 0); each
round follows ``anc`` through the CURRENT state —

    anc'(n) = anc(anc(n));  depth'(n) = depth(n) + depth(anc(n))

— so the covered distance doubles per round and any forest resolves
in ceil(log2(max_depth)) rounds, not max_depth rounds (the naive
parent-at-a-time walk; at 100 TB a deep chain would pay one shuffle
per LEVEL instead of per DOUBLING).  Convergence is "no anc moved
this round"; a CYCLE never converges and is reported as an error
when the round budget runs out rather than silently looping.

Scale shape per round: ONE self-join of the O(nodes) state on the
anc key + the changed-count action; state is localCheckpoint()ed per
round (the components.py lineage lesson).  The edge relation itself
is read once to seed the state and never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_forest(
    parents: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_iterations: int = 40,
) -> DataFrame:
    """(child, parent) rows — at most one parent per child, no
    cycles — to (node, root, depth).  Nodes appearing only as
    parents are roots (depth 0); a child with multiple parent rows
    is rejected (a DAG is not a forest)."""
    # rel feeds four consumers (dup check, both node-union branches,
    # the state seed join): truncate it once — the dup-count action
    # below materializes it (r12, the components.py lazy discipline)
    rel = parents.select(
        F.col(child).alias("c"), F.col(parent).alias("p")
    ).localCheckpoint(eager=False)
    dup = rel.groupBy("c").agg(F.count("*").alias("__n")).filter(F.col("__n") > 1)
    n_dup = dup.count()
    if n_dup:
        raise ValueError(
            f"{n_dup} children have multiple parents — input is a DAG, "
            "not a forest; resolve_forest needs unique parentage"
        )
    nodes = (
        rel.select(F.col("c").alias("node"))
        .unionByName(rel.select(F.col("p").alias("node")))
        .distinct()
    )
    state = (
        nodes.join(rel, nodes["node"] == rel["c"], "left")
        .select(
            "node",
            F.coalesce(F.col("p"), F.col("node")).alias("anc"),
            F.when(F.col("p").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("depth"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        hop = state.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("__anc2"),
            F.col("depth").alias("__d2"),
        )
        nxt = (
            state.join(hop, "anc")
            .select(
                "node",
                F.col("__anc2").alias("anc"),
                (F.col("depth") + F.col("__d2")).alias("depth"),
                (F.col("anc") != F.col("__anc2")).alias("__moved"),
            )
        ).localCheckpoint(eager=False)
        moved = nxt.filter(F.col("__moved")).count()
        state = nxt.drop("__moved")
        if moved == 0:
            return state.select(
                "node", F.col("anc").alias("root"), "depth"
            )
    raise ValueError(
        f"not converged after {max_iterations} pointer-doubling rounds "
        f"(max depth > 2^{max_iterations}) — the parent relation likely "
        "contains a cycle"
    )


def sql_resolve_forest(parents_cte: str) -> str:
    """DuckDB twin via genuine WITH RECURSIVE: ``parents_cte`` must
    define a CTE named ``parents`` with (child, parent)."""
    return f"""
    WITH RECURSIVE {parents_cte},
    nodes AS (
      -- DISTINCT over an inner UNION ALL, NOT a top-level UNION: under
      -- WITH RECURSIVE DuckDB gives every top-level-UNION CTE
      -- recursive-union semantics, which breaks the dedup here
      SELECT DISTINCT node FROM (
        SELECT child AS node FROM parents
        UNION ALL
        SELECT parent FROM parents
      )
    ),
    walk AS (
      SELECT node, node AS root, CAST(0 AS BIGINT) AS depth
      FROM nodes WHERE node NOT IN (SELECT child FROM parents)
      UNION ALL
      SELECT p.child, w.root, w.depth + 1
      FROM parents p JOIN walk w ON p.parent = w.node
    )
    SELECT node, root, depth FROM walk
    """
