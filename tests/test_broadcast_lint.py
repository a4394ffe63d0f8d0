"""Lint gate against unguarded O(big) broadcast hints (r11 verdict
ask #5).

``events_kcore`` shipped three rounds with an unconditional
``F.broadcast`` around its per-round O(nodes) alive set — the exact
pattern :func:`guarded_broadcast` exists to stop — because nothing
audited new call sites.  This test enumerates EVERY ``F.broadcast(``
call site under ``operators/`` and ``functions/`` (the reusable
engine layers; ``queries/`` call sites are adjudicated per-round in
the verdict's plan audit) via the AST and asserts each one is on the
explicit allowlist below.  Each allowlist entry names WHY the hinted
side is bounded independent of corpus size:

- ``scalar``   — a 1-row aggregate attach (the documented
                 ``crossJoin(F.broadcast(one_row_agg))`` idiom).
- ``top-k``    — a ``.limit(k)`` / top-k head, k a user parameter.
- ``k-rows``   — O(k) model rows: centroids, codebooks, LUTs,
                 per-bucket prefix offsets (O(shuffle partitions)),
                 fixed-size sketches, per-dim thresholds.
- ``eval-set`` — bounded by the decontamination eval set, which is
                 small by contract (documented in dedup.py).
- ``query-set``— bounded by the caller's probe/query batch, small by
                 contract vs the corpus side (similarity search).
- ``guard``    — the single conditional hint inside
                 :func:`guarded_broadcast` itself.

A NEW ``F.broadcast(`` call site in these packages fails this test
until it is either routed through ``guarded_broadcast`` or
adjudicated here with a boundedness category — so the kcore class of
gap cannot silently recur with the next operator.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = (
    Path(__file__).resolve().parents[1]
    / "crypto_price_tracker_with_etl_dashboard_spark"
)

# (relative path, broadcast-argument source text) -> boundedness
# category.  The argument TEXT (not the line number) keys the entry,
# so refactors that move lines don't churn the allowlist while a new
# or changed hinted side still trips the gate.
ALLOWLIST: dict[tuple[str, str], str] = {
    # 1-row normalization total (sum of scores), crossJoin attach
    ("operators/hits.py", "total"): "scalar",
    # top_n symbol heads via .limit(top_n) (beta / lead-lag)
    ("operators/indicators.py", "topn"): "top-k",
    # per-bucket prefix offsets: O(num shuffle buckets) rows
    ("operators/rank.py", "offsets"): "k-rows",
    # THE guard: the only conditional F.broadcast in the package
    ("operators/_broadcast_guard.py", "df"): "guard",
    # per-bucket prefix offsets (deterministic global shuffle)
    ("functions/sampling.py", "offsets"): "k-rows",
    # decontamination: eval-set shingles, bounded by eval-set size
    ("functions/dedup.py", "ev_sh"): "eval-set",
    ("functions/dedup.py", "ev_distinct"): "eval-set",
    ("functions/dedup.py", "matched"): "eval-set",
    # corpus-level 1-row stats + capped df head (BM25)
    ("functions/text.py", "stats"): "scalar",
    ("functions/text.py", "dfs"): "k-rows",
    # 1-row eigenvector norm (PCA power iteration)
    ("functions/decomp.py", "nrm"): "scalar",
    # fixed-size mergeable sketch rows
    ("functions/sketch.py", "sketch"): "k-rows",
    ("functions/sketch.py",
     'bits.select(F.col("bit").alias(f"__set{j}"))'): "k-rows",
    # similarity search: probe/query batches, centroid sets,
    # codebooks, LUTs, thresholds — all O(k) model rows or bounded
    # query batches, never the corpus side (plan-pinned in
    # tests/test_plans.py: the corpus scans once, unshuffled)
    ("functions/similarity.py", "q"): "query-set",
    ("functions/similarity.py", "cents"): "k-rows",
    ("functions/similarity.py", "probes"): "k-rows",
    ("functions/similarity.py", "stats"): "scalar",
    ("functions/similarity.py", "packed"): "k-rows",
    ("functions/similarity.py", "books"): "k-rows",
    ("functions/similarity.py", "q_lut"): "query-set",
    ("functions/similarity.py", "cents_ivf"): "k-rows",
    ("functions/similarity.py", "probe_luts"): "query-set",
    ("functions/similarity.py", "topk"): "top-k",
    ("functions/similarity.py",
     "binary_thresholds(corpus, vec_col, dim)"): "k-rows",
}

# Iterative graph operators must have ZERO direct F.broadcast call
# sites other than documented scalar/top-k attaches — their O(nodes)
# per-round joins belong to guarded_broadcast (the kcore lesson).
GRAPH_MODULES = {
    "operators/pagerank.py", "operators/lpa.py", "operators/hits.py",
    "operators/kcore.py", "operators/ktruss.py",
    "operators/triangles.py", "operators/components.py",
    "operators/bfs.py",
}


def _broadcast_sites():
    """Yield (relpath, arg_source) for every F.broadcast(...) call
    under operators/ and functions/ (non-test engine code)."""
    for sub in ("operators", "functions"):
        for py in sorted((PKG / sub).glob("*.py")):
            src = py.read_text()
            tree = ast.parse(src)
            rel = f"{sub}/{py.name}"
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                fn = node.func
                if (
                    isinstance(fn, ast.Attribute)
                    and fn.attr == "broadcast"
                    and isinstance(fn.value, ast.Name)
                    and fn.value.id == "F"
                ):
                    arg = ast.get_source_segment(src, node.args[0])
                    yield rel, " ".join(arg.split())


def test_every_engine_broadcast_site_is_adjudicated():
    sites = list(_broadcast_sites())
    assert sites, "AST walk found no call sites — lint is broken"
    unlisted = [s for s in sites if s not in ALLOWLIST]
    assert unlisted == [], (
        "New F.broadcast( call site(s) in engine code — route through "
        "guarded_broadcast or adjudicate a boundedness category in "
        f"tests/test_broadcast_lint.py: {unlisted}"
    )
    # and the allowlist carries no dead entries (site was removed or
    # renamed but the adjudication lingers, masking a future add)
    live = set(sites)
    dead = [k for k in ALLOWLIST if k not in live]
    assert dead == [], f"stale allowlist entries: {dead}"


def test_graph_operators_only_scalar_or_topk_broadcasts():
    """The per-round O(nodes) joins of every iterative graph operator
    go through guarded_broadcast; any direct hint there must be a
    1-row scalar or top-k attach."""
    for rel, arg in _broadcast_sites():
        if rel in GRAPH_MODULES and rel != "operators/_broadcast_guard.py":
            assert ALLOWLIST[(rel, arg)] in ("scalar", "top-k"), (
                rel,
                arg,
            )


def test_guard_module_owns_the_only_conditional_hint():
    guard_sites = [
        (rel, arg)
        for rel, arg in _broadcast_sites()
        if rel == "operators/_broadcast_guard.py"
    ]
    assert guard_sites == [("operators/_broadcast_guard.py", "df")]
