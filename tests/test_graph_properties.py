"""Property-based checks (hypothesis) for the graph and fuzzy-join
operators: the distributed implementations must agree with
straightforward single-threaded reference implementations on
arbitrary inputs (random graphs / random strings)."""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st

from crypto_price_tracker_with_etl_dashboard_spark.functions.dedup import (
    fuzzy_key_pairs,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.lpa import (
    label_propagation,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.triangles import (
    CC_SCALE,
    triangle_counts,
)

EXAMPLES = 8  # each example is a full Spark job

edge_sets = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
).map(lambda es: sorted({(min(a, b), max(a, b)) for a, b in es}))


@settings(max_examples=EXAMPLES, deadline=None)
@given(edge_sets)
def test_triangle_counts_match_bruteforce(spark, edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for n, nbrs in adj.items():
        tris = sum(
            1 for a, b in itertools.combinations(sorted(nbrs), 2) if b in adj[a]
        )
        deg = len(nbrs)
        cc = (
            0
            if deg < 2
            else (4 * tris * CC_SCALE + deg * (deg - 1)) // (2 * deg * (deg - 1))
        )
        want[n] = (deg, tris, cc)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: (r["degree"], r["triangles"], r["cc_ppm"])
        for r in triangle_counts(df).collect()
    }
    assert got == want


@settings(max_examples=EXAMPLES, deadline=None)
@given(edge_sets, st.integers(min_value=1, max_value=3))
def test_lpa_matches_sequential_simulation(spark, edges, iters):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == labels


keys = st.lists(
    st.text(alphabet="abcd", min_size=0, max_size=8), min_size=2, max_size=12
)


@settings(max_examples=EXAMPLES, deadline=None)
@given(keys, st.integers(min_value=0, max_value=3))
def test_fuzzy_pairs_match_bruteforce(spark, ks, max_dist):
    def grams(s: str, q: int = 3) -> set[str]:
        if len(s) < q:
            return {s[:q]}  # whole short key (empty string included)
        return {s[i : i + q] for i in range(len(s) - q + 1)}

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = list(enumerate(ks))
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if grams(a) & grams(b) and lev(a, b) <= max_dist
    }
    df = spark.createDataFrame(rows, ["doc_id", "key"])
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_key_pairs(df, max_dist=max_dist).collect()
    }
    assert got == want


@settings(max_examples=EXAMPLES, deadline=None)
@given(edge_sets, st.integers(min_value=1, max_value=3))
def test_triangle_estimator_matches_duckdb_on_random_graphs(spark, edges, cap):
    """With the sampled-wedge estimator enabled (est cap 2), the full
    Spark output — exact rows AND hub estimate rows — must equal the
    DuckDB twin bit-for-bit on arbitrary graphs and caps, and every
    node of the graph must appear exactly once (the r9 fix: capped
    hubs report estimates instead of vanishing)."""
    import duckdb

    from crypto_price_tracker_with_etl_dashboard_spark.operators.triangles import (
        sql_triangle_counts,
    )

    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: (
            r["degree"], r["triangles"], r["cc_ppm"], r["n_sampled_wedges"]
        )
        for r in triangle_counts(
            df, max_degree=cap, est_neighbor_cap=2
        ).collect()
    }
    values = ", ".join(f"({u},{v})" for u, v in edges)
    want = {
        n: (d, t, c, w)
        for n, d, t, c, w in duckdb.sql(
            sql_triangle_counts(
                f"edges AS (SELECT * FROM (VALUES {values}) t(u, v))",
                max_degree=cap,
                est_neighbor_cap=2,
            )
        ).fetchall()
    }
    assert got == want
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    assert set(got) == nodes  # nobody vanishes
    for n, (d, t, c, w) in got.items():
        if w > 0:
            assert d > cap and 0 <= c <= CC_SCALE
        else:
            assert d <= cap
