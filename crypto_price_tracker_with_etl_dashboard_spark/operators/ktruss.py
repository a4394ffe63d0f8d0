"""k-truss peeling — the edge-cohesion complement to node k-core
(operators/kcore.py): the k-truss keeps an edge only while it closes
at least k-2 triangles with OTHER surviving edges, so it isolates the
densely clique-like core a degree-based core cannot see (a star hub
has high degree but zero triangle support).  Training-data uses:
extracting tightly-knit user/community cores from interaction graphs,
spam-ring confirmation (rings are triangle-dense, broadcast spam is
triangle-free), backbone extraction before expensive per-edge models.

Determinism discipline (the kcore/lpa pattern): the textbook
algorithm peels to a fixpoint; here the peel runs a FIXED number of
rounds so the DuckDB oracle unrolls it CTE-for-CTE and every output
row is engine-exact (pure integer support counts, no floats
anywhere).  A fixed-round peel is also what a production pipeline
ships: each round costs one full triangle pass, so bounded rounds =
bounded cost, and on real graphs support collapses geometrically (two
rounds remove the overwhelming majority of sub-truss edges).

Scale shape per round (the Suri-Vassilvitskii orientation from
operators/triangles.py): orient the surviving edges by (degree, id),
enumerate wedges from out-neighborhoods — O(m^1.5) total wedge work,
no reducer sees a super-heavy key — close them against the oriented
edge list, then explode each triangle into its three undirected
edges and hash-aggregate per-edge support.  Everything is joins +
aggregates on bigint keys; the edge list is cached once per round and
the round count is fixed, so total cost is rounds x one triangle
pass over a shrinking edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KTRUSS_CACHE: dict[str, list[DataFrame]] = {}


def _edge_support(e: DataFrame) -> DataFrame:
    """(u, v, support) for every edge of ``e`` that closes at least
    one triangle in ``e``.  ``e`` holds each undirected edge once as
    (u, v), u < v.  Enumeration is degree-oriented (each triangle
    found exactly once as a -> b -> c in (deg, id) order), then each
    triangle credits its three edges in id order via least/greatest —
    so the support table is keyed exactly like ``e``."""
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
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
    )
    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("ddeg").alias("bdeg")
    )
    e2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("ddeg").alias("cdeg")
    )
    wedges = e1.join(e2, "a").filter(F.struct("bdeg", "b") < F.struct("cdeg", "c"))
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"]).select("a", "b", "c")
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("u"), F.greatest(x, y).alias("v")
    )
    return (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("a"), F.col("b")),
                    pair(F.col("a"), F.col("c")),
                    pair(F.col("b"), F.col("c")),
                )
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("support"))
    )


def ktruss(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 2,
    src: str = "u",
    dst: str = "v",
    max_degree: int | None = None,
) -> DataFrame:
    """Surviving edges after ``rounds`` synchronous k-truss peels:
    one row ``(u, v, support)`` per edge still present, reporting the
    support THAT JUSTIFIED its survival (measured on the edge set the
    final peel filtered — so always >= k-2).  Reporting the survival
    support instead of re-counting on the surviving subgraph saves a
    whole extra triangle pass per call (one pass per round is the
    entire cost; the recompute variant measured 20.5 s -> 13 s at
    sf0.1), and the fixed-round unrolled oracle mirrors the same
    choice CTE-for-CTE.

    ``edges`` holds each undirected edge once as (u, v), u < v, no
    self-loops (the triangle_counts input contract).

    ``max_degree`` is the celebrity-node guard (the triangle_counts
    precedent — SAME graph, same failure): the peel runs on the
    subgraph induced by nodes whose FULL-graph degree is <= the cap.
    On a densified near-complete graph the support pass's wedge
    stage is Theta(n^3) (the sf1 co-occurrence replica wedged this
    operator for >10 min uncapped); capped, wedge volume is
    <= n * C(max_degree, 2).  At every certified SF the max observed
    degree is far below the cap, so oracle results are unchanged."""
    if k < 3:
        raise ValueError(f"k must be >= 3 (k-2 >= 1 support), got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    app_id = edges.sparkSession.sparkContext.applicationId
    from crypto_price_tracker_with_etl_dashboard_spark.operators._broadcast_guard import (
        evict_stale_app_entries,
    )

    evict_stale_app_entries(_KTRUSS_CACHE, app_id)
    for prev in _KTRUSS_CACHE.pop(app_id, []):
        prev.unpersist()
    # Skip the cache when the CALLER already cached the input (r11
    # ADVICE): re-caching an identical plan warns ("Asked to cache
    # already cached data") and the pop-and-unpersist on the NEXT call
    # would drop a cache entry a sibling operator on the same edge
    # build still relies on, forcing a silent recompute.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    held = []
    if not (edges.storageLevel.useMemory or edges.storageLevel.useDisk):
        e = e.cache()
        held.append(e)
    e.count()  # materialize before the multi-branch support pass
    if max_degree is not None:
        keep = (
            e.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") <= max_degree)
            .select("node")
        )
        ku = keep.select(F.col("node").alias("u"))
        kv = keep.select(F.col("node").alias("v"))
        e = e.join(ku, "u").join(kv, "v").select("u", "v").cache()
        e.count()
        held.append(e)
    kept = None
    for _ in range(rounds):
        sup = _edge_support(e)
        # keep (u, v, support) CACHED so the returned last round needs
        # no recompute; the next round's edge set is a projection
        kept = (
            e.join(sup, ["u", "v"])
            .filter(F.col("support") >= k - 2)
            .select("u", "v", F.col("support").cast("bigint").alias("support"))
            .cache()
        )
        kept.count()
        held.append(kept)
        e = kept.select("u", "v")
    _KTRUSS_CACHE[app_id] = held
    return kept


def sql_ktruss(
    edges_cte: str,
    k: int = 4,
    rounds: int = 2,
    max_degree: int | None = None,
) -> str:
    """DuckDB twin, peels unrolled one CTE triple per round.
    ``edges_cte`` must end in a CTE named ``edges`` with (u, v),
    u < v, each undirected edge once.  Every unrolled CTE is
    MATERIALIZED: each peel references its edge set three times (two
    wedge arms + the closer) and DuckDB re-inlines plain CTEs per
    reference, compounding the whole upstream build 3^rounds times
    (measured 573 s -> ~2 s at sf0.001; the sql_hits precedent).  Triangles enumerate in id
    order (a < b < c) — a different enumeration order than the Spark
    side's degree orientation, but both find every triangle of the
    undirected graph exactly once, so the per-edge support counts are
    identical."""
    its = []
    prev = "e0"
    for r in range(rounds):
        t, s, nxt = f"t{r}", f"s{r}", f"e{r + 1}"
        its.append(f"""
    {t} AS MATERIALIZED (
      SELECT w1.u AS a, w1.v AS b, w2.v AS c
      FROM {prev} w1
      JOIN {prev} w2 ON w2.u = w1.u AND w2.v > w1.v
      JOIN {prev} w3 ON w3.u = w1.v AND w3.v = w2.v
    ),
    {s} AS MATERIALIZED (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT a AS u, b AS v FROM {t}
        UNION ALL SELECT a, c FROM {t}
        UNION ALL SELECT b, c FROM {t}
      ) GROUP BY u, v
    ),
    {nxt} AS MATERIALIZED (
      SELECT e.u, e.v, s.support FROM {prev} e
      JOIN {s} s ON s.u = e.u AND s.v = e.v
      WHERE s.support >= {k - 2}
    )""")
        prev = nxt
    if max_degree is None:
        e0 = "e0 AS MATERIALIZED (SELECT u, v FROM edges)"
    else:
        e0 = f"""keepn AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, COUNT(*) AS deg FROM (
          SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
      ) WHERE deg <= {max_degree}
    ),
    e0 AS MATERIALIZED (
      SELECT e.u, e.v FROM edges e
      JOIN keepn a ON a.node = e.u
      JOIN keepn b ON b.node = e.v
    )"""
    return f"""
    WITH {edges_cte},
    {e0},{','.join(its)}
    SELECT u, v, support FROM {prev}
    """
