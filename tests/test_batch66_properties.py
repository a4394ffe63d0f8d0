"""Property tests for batch 66: the Spark coreness decomposition
agrees with an independent brute-force Python reimplementation on
seeded random graphs.  Deterministic seeds (no flaky generators);
brute force is written from the DEFINITION (min-degree peeling per
threshold), not from the operator code, so a shared bug cannot
hide."""

from __future__ import annotations

import itertools
import random

from crypto_price_tracker_with_etl_dashboard_spark.operators.kcore import (
    core_decomposition,
)


def _brute_core_numbers(
    edges: set[tuple[int, int]], max_k: int
) -> dict[int, int]:
    """Definition-level capped coreness: for k = 1..max_k, peel
    nodes of in-subgraph degree < k to a fixpoint; core(v) = the
    largest k whose fixpoint retains v."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core = {v: 0 for v in adj}
    for k in range(1, max_k + 1):
        cur = {v: set(nb) for v, nb in adj.items()}
        changed = True
        while changed:
            changed = False
            for v in list(cur):
                if len(cur[v]) < k:
                    for w in cur[v]:
                        cur[w].discard(v)
                    del cur[v]
                    changed = True
        for v in cur:
            core[v] = k
    return {v: c for v, c in core.items() if c >= 1}


def _random_graph(seed: int, n: int, p: float) -> set[tuple[int, int]]:
    rng = random.Random(seed)
    return {
        (u, v)
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < p
    }


def test_core_decomposition_matches_brute_force_on_random_graphs(spark):
    for seed, n, p, max_k in [
        (11, 10, 0.3, 4),
        (12, 14, 0.35, 5),
        (13, 20, 0.25, 6),
        (14, 25, 0.5, 8),
    ]:
        edges = _random_graph(seed, n, p)
        if not edges:
            continue
        df = spark.createDataFrame(sorted(edges), ["u", "v"])
        got = {
            r.node: r.core
            for r in core_decomposition(
                df, max_k=max_k, rounds_per_level=12
            ).collect()
        }
        want = _brute_core_numbers(edges, max_k)
        assert got == want, (seed, n, p, max_k)


def test_core_decomposition_nested_under_threshold_raise(spark):
    """Monotone nesting on a random graph: the k-level survivor sets
    read off the decomposition must nest (core >= k+1 implies
    core >= k) and the minimum reported core is exactly 1."""
    edges = _random_graph(99, 18, 0.3)
    df = spark.createDataFrame(sorted(edges), ["u", "v"])
    rows = core_decomposition(df, max_k=6, rounds_per_level=12).collect()
    cores = sorted(r.core for r in rows)
    assert cores[0] == 1
    by_level = {
        k: {r.node for r in rows if r.core >= k} for k in range(1, 7)
    }
    for k in range(1, 6):
        assert by_level[k + 1] <= by_level[k]
