"""k-core decomposition (bounded peel) over an undirected edge list.

The density filter graph pipelines run before expensive per-node
work: the k-core is the maximal subgraph where every node keeps
degree >= k, found by iteratively peeling nodes of degree < k
(Matula & Beck, JACM 1983 — peeling converges because removal only
ever lowers degrees).  Spam/bot rings and tight communities survive;
tendrils and one-off co-occurrences fall away.

Scale shape (the PageRank/LPA envelope): the edge list is read from
its cache; each round re-derives degrees with one explode + partial
agg and joins the O(nodes) alive set back as a BROADCAST — edges
never reshuffle.  The peel stops at the FIRST round that removes
nothing (one count() action per round, same driver-scalar discipline
as connected_components' convergence check); round count is bounded
by the peel depth, which is tiny on real degree distributions (2-4
here).  The DuckDB oracle unrolls a fixed number of rounds — valid
because peeling is monotone: once converged, further rounds are
no-ops, so an R-round unroll equals the fixpoint whenever
convergence happens within R (asserted by the operator's
``max_rounds`` raise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    # materialize the edge projection ONCE (the triangles/LPA edge
    # discipline): an uncached input would otherwise re-run its whole
    # upstream build on every round's action
    e = edges.select("u", "v").localCheckpoint(eager=True)
    deg = _degrees(e)
    # localCheckpoint per round (the pagerank/LPA/components
    # discipline): without it every round's count() re-executes all
    # previous rounds' semi-join + degree chains — O(rounds^2)
    # recompute on a deep peel
    alive = deg.filter(F.col("deg") >= k).select("node").localCheckpoint(eager=True)
    n_alive = alive.count()
    for _ in range(max_rounds):
        e_alive = (
            e.join(F.broadcast(alive.withColumnRenamed("node", "u")), "u", "left_semi")
            .join(F.broadcast(alive.withColumnRenamed("node", "v")), "v", "left_semi")
        )
        deg = _degrees(e_alive)
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
