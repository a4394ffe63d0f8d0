"""Property tests for batch 65: the Spark k-truss peel and the
IDF-weighted Jaccard agree with independent brute-force Python
reimplementations on seeded random inputs.  Deterministic seeds (no
flaky generators); brute force is written from the DEFINITIONS, not
from the operator code, so a shared bug cannot hide."""

from __future__ import annotations

import itertools
import random

from crypto_price_tracker_with_etl_dashboard_spark.operators.ktruss import ktruss


def _brute_ktruss(edges: set[tuple[int, int]], k: int, rounds: int):
    """Definition-level peel: per round, count each edge's triangles
    in the CURRENT set, keep those with support >= k-2, remember the
    support that justified survival."""
    cur = set(edges)
    supports: dict[tuple[int, int], int] = {}
    for _ in range(rounds):
        sup = {}
        for (u, v) in cur:
            s = 0
            for w in {x for e in cur for x in e}:
                if w in (u, v):
                    continue
                a = (min(u, w), max(u, w))
                b = (min(v, w), max(v, w))
                if a in cur and b in cur:
                    s += 1
            sup[(u, v)] = s
        cur = {e for e in cur if sup[e] >= k - 2}
        supports = {e: sup[e] for e in cur}
    return supports


def _random_graph(seed: int, n: int, p: float) -> set[tuple[int, int]]:
    rng = random.Random(seed)
    return {
        (u, v)
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < p
    }


def test_ktruss_matches_brute_force_on_random_graphs(spark):
    for seed, n, p, k, rounds in [
        (1, 8, 0.5, 3, 2),
        (2, 10, 0.4, 3, 1),
        (3, 9, 0.6, 4, 2),
        (4, 12, 0.3, 3, 3),
        (5, 7, 0.8, 5, 2),
    ]:
        edges = _random_graph(seed, n, p)
        if not edges:
            continue
        want = _brute_ktruss(edges, k, rounds)
        df = spark.createDataFrame(sorted(edges), ["u", "v"])
        got = {
            (r.u, r.v): r.support for r in ktruss(df, k=k, rounds=rounds).collect()
        }
        assert got == want, (seed, n, p, k, rounds)


def _brute_idf_wj(docs: list[tuple[int, str, str]], max_df: int, w_scale: int):
    """Definition-level weighted Jaccard: distinct 3-word shingles,
    per-(lang, shingle) df, integer weight (w_scale * n_docs_lang)
    // df for df <= max_df, score = 1e6 * inter // (ta + tb - inter)."""
    sh = {}
    for doc_id, text, lang in docs:
        toks = text.split()
        sh[(doc_id, lang)] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    n_lang = {}
    for _, _, lang in docs:
        n_lang[lang] = n_lang.get(lang, 0) + 1
    df = {}
    for (doc_id, lang), ss in sh.items():
        for s in ss:
            df[(lang, s)] = df.get((lang, s), 0) + 1
    w = {
        key: (w_scale * n_lang[key[0]]) // cnt
        for key, cnt in df.items()
        if cnt <= max_df
    }
    kept = {
        (doc_id, lang): {s for s in ss if (lang, s) in w}
        for (doc_id, lang), ss in sh.items()
    }
    tot = {
        doc_id: sum(w[(lang, s)] for s in ss)
        for (doc_id, lang), ss in kept.items()
    }
    out = {}
    ids = sorted({(d, lang) for (d, lang) in kept})
    for (a, la), (b, lb) in itertools.combinations(ids, 2):
        if la != lb:
            continue
        inter = sum(w[(la, s)] for s in kept[(a, la)] & kept[(b, lb)])
        if inter <= 0:
            continue
        ppm = (1_000_000 * inter) // (tot[a] + tot[b] - inter)
        if ppm >= 100_000:
            out[(a, b)] = (inter, ppm)
    return out


def test_idf_weighted_jaccard_matches_brute_force(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        _IDF_W_SCALE,
        _NGRAM_MAX_DF,
        q_doc_idf_weighted_jaccard,
    )
    import crypto_price_tracker_with_etl_dashboard_spark.queries.text as tq

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for doc_id in range(24):
        base = rng.choices(vocab, k=rng.randint(4, 18))
        docs.append((doc_id, " ".join(base), rng.choice(["en", "de"])))
    # plant near-dup pairs: copies with small suffix edits
    docs.append((100, docs[0][1] + " extra token here", docs[0][2]))
    docs.append((101, docs[1][1], docs[1][2]))

    want = _brute_idf_wj(docs, _NGRAM_MAX_DF, _IDF_W_SCALE)
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    orig = tq.load_table
    tq.load_table = lambda s, d, t: df
    try:
        rows = q_doc_idf_weighted_jaccard(spark, "unused").collect()
    finally:
        tq.load_table = orig
    got = {(r.doc_a, r.doc_b): (r.inter_w, r.wj_ppm) for r in rows}
    assert got == want
    assert (1, 101) in got  # the planted exact copy surfaced
