"""Unit tests for the batch-19 operators: incremental join
maintenance (operators/incremental.py::join_delta/maintained_join)
and personalized PageRank (operators/pagerank.py personalize=).
Query-level equivalence vs DuckDB is the oracle harness's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.incremental import (
    join_delta,
    maintained_join,
)
from crypto_price_tracker_with_etl_dashboard_spark.operators.pagerank import (
    pagerank,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_maintained_join_equals_recompute(spark):
    bl = _df(spark, [(1, "a"), (2, "b")], "k bigint, lv string")
    br = _df(spark, [(1, 10), (3, 30)], "k bigint, rv int")
    dl = _df(spark, [(3, "c"), (4, "d")], "k bigint, lv string")
    dr = _df(spark, [(2, 20), (4, 40), (1, 11)], "k bigint, rv int")
    maintained = maintained_join(bl, br, dl, dr, on=["k"])
    full = bl.unionByName(dl).join(br.unionByName(dr), ["k"])
    got = sorted(tuple(r) for r in maintained.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
    assert len(got) == 5  # (1,a,10) (1,a,11) (2,b,20) (3,c,30) (4,d,40)


def test_join_delta_never_pairs_base_with_base(spark):
    # the whole point of IVM: the base|x|base term must NOT reappear
    bl = _df(spark, [(1, "a")], "k bigint, lv string")
    br = _df(spark, [(1, 10)], "k bigint, rv int")
    empty_l = bl.filter(F.lit(False))
    empty_r = br.filter(F.lit(False))
    assert join_delta(bl, br, empty_l, empty_r, on=["k"]).count() == 0


def test_join_delta_counts_delta_delta_once(spark):
    bl = _df(spark, [], "k bigint, lv string")
    br = _df(spark, [], "k bigint, rv int")
    dl = _df(spark, [(7, "x")], "k bigint, lv string")
    dr = _df(spark, [(7, 70)], "k bigint, rv int")
    assert join_delta(bl, br, dl, dr, on=["k"]).count() == 1


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src bigint, dst bigint, w bigint")


def test_personalized_pagerank_mass_concentrates_at_source(spark):
    # star graph: 1 <-> {2, 3, 4}; personalization at 1 must rank the
    # source first, and strictly above its uniform-teleport rank
    e = _edges(
        spark,
        [(1, 2, 1), (2, 1, 1), (1, 3, 1), (3, 1, 1), (1, 4, 1), (4, 1, 1)],
    )
    ppr = {r["node"]: r["pagerank"] for r in pagerank(e, iters=4, personalize=1).collect()}
    plain = {r["node"]: r["pagerank"] for r in pagerank(e, iters=4).collect()}
    assert ppr[1] == max(ppr.values())
    assert ppr[1] > plain[1]
    # leaves are symmetric — identical ranks
    assert ppr[2] == ppr[3] == ppr[4]


def test_personalized_pagerank_unreached_nodes_decay_to_zero_mass(spark):
    # a component not reachable from the source gets no teleport and
    # no walk mass: its rank must sink below every reachable node's
    e = _edges(spark, [(1, 2, 1), (2, 1, 1), (8, 9, 1), (9, 8, 1)])
    ppr = {r["node"]: r["pagerank"] for r in pagerank(e, iters=6, personalize=1).collect()}
    assert max(ppr[8], ppr[9]) < min(ppr[1], ppr[2])
