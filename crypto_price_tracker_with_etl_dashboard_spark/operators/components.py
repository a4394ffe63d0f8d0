"""Connected components over a pair graph — the step that turns
near-duplicate PAIRS (MinHash-LSH / SimHash / embedding-cosine
candidates) into duplicate CLUSTERS so a training pipeline can keep
one canonical document per cluster.

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round a node takes the min of its label and its
neighbors' labels; converges when no label changes.  Rounds needed =
graph diameter — for dedup graphs that is tiny (clusters are small
and dense), so this beats the more complex large-star/small-star
contraction in practice while using only DataFrame joins/aggregates.

Scale shape per round: one join of the (symmetrized) edge list with
the label table on the neighbor key + one min-aggregate on the node
key — two hash shuffles, both on node ids, no driver-side data.
Labels are localCheckpoint()ed each round to truncate lineage (an
iterative plan otherwise grows exponentially).  The convergence check
is a count() action per round; ``max_iterations`` bounds the loop for
adversarial graphs (a 100 TB path graph should use star-contraction
instead — not the dedup workload shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component) where
    ``component`` is the minimum node id reachable from ``node``.
    Nodes not appearing in any edge are absent (callers union
    singletons back if needed)."""
    sym = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
    )
    labels = sym.select("n").distinct().withColumn("component", F.col("n"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(
                labels.select(F.col("n").alias("m"), F.col("component").alias("m_comp")),
                on="m",
            )
            .groupBy("n")
            .agg(F.min("m_comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(nbr_min, on="n", how="left")
            .select(
                "n",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_comp") < F.col("component")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("n").alias("node"), "component")
