"""Distributed triangle counting + local clustering coefficients.

The classic MPC/MapReduce formulation (Suri & Vassilvitskii, "Counting
Triangles and the Curse of the Last Reducer", WWW'11): orient every
undirected edge from its lower-(degree, id) endpoint to its higher one,
enumerate wedges from each source's out-neighborhood, and close them
against the oriented edge list.  Degree orientation bounds every
out-degree by O(sqrt(m)), so the wedge stage is O(m^1.5) total work and
no single reducer sees a super-heavy key — the property that makes the
plan survive skewed degree distributions at 100 TB (a raw node-iterator
join explodes on the highest-degree vertex).

Reference parity note: the reference dashboard has no graph analytics;
this operator extends the engine for training-data/graph workloads the
same way PageRank (operators/pagerank.py) and connected components
(operators/components.py) do.

Shuffle inventory (see SCALE.md): degree agg (1 shuffle on node),
two orientation joins (broadcast when the degree table fits, else
shuffle on node id), the wedge self-join + closure join (shuffles on
src / (src, dst)), final per-node count agg.  All keys are bigints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale for the clustering coefficient (parts-per-million)
CC_SCALE = 1_000_000

# Session-scoped cache of the materialized intermediates (the oriented
# edge list feeds THREE join branches and the degree table three more;
# uncached, Spark re-runs the whole upstream edge build per branch —
# measured 5.4s -> ~1.5s at sf0.1).  Evict-on-reentry keyed by
# applicationId: unpersisting before the returned lazy DF executes
# would force full recompute (see functions/dedup.py::_BANDED_CACHE).
_CACHE: dict[str, list[DataFrame]] = {}


def _hold(app_id: str, *dfs: DataFrame) -> None:
    prev = _CACHE.pop(app_id, None)
    if prev is not None:
        for d in prev:
            d.unpersist()
    _CACHE[app_id] = list(dfs)


def triangle_counts(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    ``edges`` must hold each undirected edge EXACTLY ONCE as
    ``(u, v)`` with ``u < v`` (no self-loops, no duplicates) — the
    invariant the co-supply builder in queries/graph.py establishes
    with its ``a.s < b.s`` self-join predicate.

    ``max_degree`` is the celebrity-node guard: when set, the count
    runs on the subgraph induced by nodes whose FULL-graph degree is
    <= the cap (hub nodes are excluded from the output entirely).
    Degree orientation bounds each out-degree by O(sqrt(m)) for the
    *typical* node, but a densified core (every node a hub) still
    yields Theta(n^3) wedges — the standard production mitigation is
    exactly this cap (triangle analyses routinely drop super-hubs,
    whose local clustering is near-0 noise anyway).  Uncapped, a
    near-complete 1500-node graph OOMs an 8 GiB local heap at the
    wedge stage; capped, wedge volume is <= n * C(max_degree, 2).

    Returns one row per (surviving) node that appears in the edge
    list: ``(node, degree, triangles, cc_ppm)`` where ``cc_ppm`` is
    the local clustering coefficient ``2*T / (d*(d-1))`` in
    round-half-up parts-per-million (integer arithmetic, so the
    DuckDB oracle reproduces it bit-for-bit; 0 for degree-1 nodes).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).cache()
    e.count()  # materialize BEFORE fan-out (first-action branches recompute)

    # explode, not union-of-projections: a union's branches each
    # re-read their upstream inside one action, doubling the pass
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    deg = deg.cache()
    deg.count()  # feeds both orientation joins and the final join

    # Orient u->v when (deg(u), u) < (deg(v), v): a total order, so the
    # oriented graph is a DAG and every triangle is counted exactly
    # once as (a -> b -> c, a -> c).  Carry the destination's
    # (deg, id) so the wedge join can order endpoints without a third
    # lookup.
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("udeg"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("vdeg"))
    lower_first = F.struct("udeg", "u") < F.struct("vdeg", "v")
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("vdeg")).otherwise(F.col("udeg")).alias("ddeg"),
        )
        .cache()
    )
    oriented.count()  # materialize; feeds the two wedge sides + closure
    _hold(edges.sparkSession.sparkContext.applicationId, e, deg, oriented)

    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("ddeg").alias("bdeg")
    )
    e2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("ddeg").alias("cdeg")
    )
    # wedge (a; b, c) ordered by the SAME (deg, id) total order the
    # orientation used, so the closing edge — if present — is exactly
    # the oriented row (src=b, dst=c)
    wedges = e1.join(e2, "a").filter(
        F.struct("bdeg", "b") < F.struct("cdeg", "c")
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"]).select("a", "b", "c")

    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )

    pairs = F.col("deg") * (F.col("deg") - F.lit(1))  # 2 * C(deg, 2)
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint").alias("triangles"),
            F.when(F.col("deg") < 2, F.lit(0))
            .otherwise(
                # round-half-up integer ppm: (2*T*SCALE*2 + d*(d-1)) div (2*d*(d-1))
                F.expr(
                    f"(4 * coalesce(triangles, 0) * {CC_SCALE}"
                    " + deg * (deg - 1)) div (2 * deg * (deg - 1))"
                )
            )
            .cast("bigint")
            .alias("cc_ppm"),
        )
    )


def sql_triangle_counts(edges_cte: str, max_degree: int | None = None) -> str:
    """DuckDB twin: ``edges_cte`` must define a CTE named ``edges``
    with columns ``(u, v)``, u < v, each undirected edge once."""
    cap = f"WHERE deg <= {max_degree}" if max_degree is not None else ""
    return f"""
    WITH {edges_cte},
    deg AS (
      SELECT node, deg FROM (
        SELECT node, COUNT(*) AS deg FROM (
          SELECT u AS node FROM edges
          UNION ALL
          SELECT v AS node FROM edges
        ) GROUP BY node
      ) {cap}
    ),
    oriented AS (
      SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst,
             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS ddeg
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oriented e1
      JOIN oriented e2 ON e1.src = e2.src
                      AND (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)
      JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    per_node AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, degree, triangles, cc_ppm FROM (
      SELECT d.node AS node,
             d.deg AS degree,
             CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
             CAST(CASE WHEN d.deg < 2 THEN 0
                  ELSE (4 * COALESCE(p.triangles, 0) * {CC_SCALE}
                        + d.deg * (d.deg - 1)) // (2 * d.deg * (d.deg - 1))
                  END AS BIGINT) AS cc_ppm
      FROM deg d LEFT JOIN per_node p ON p.node = d.node
    )"""
