"""Unit tests for the batch-21 operators: HITS hubs/authorities
(operators/hits.py) and On-Balance Volume
(operators/indicators.py::obv).  Query-level equivalence vs DuckDB
is the oracle harness's job (check_oracle-certified at sf0.01 and
sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMALL

from crypto_price_tracker_with_etl_dashboard_spark.operators.hits import UNIT, hits
from crypto_price_tracker_with_etl_dashboard_spark.operators.indicators import obv


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src bigint, dst bigint, w bigint")


def test_hits_star_authority(spark):
    # three hubs all pointing at one center: the center is the sole
    # authority (=UNIT after L1), hubs split the hub mass evenly
    out = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            _edges(spark, [(1, 9, 1), (2, 9, 1), (3, 9, 1)]), iters=2
        ).collect()
    }
    assert out[9][1] > 0.99 and out[9][0] == 0.0
    for h in (1, 2, 3):
        assert abs(out[h][0] - 1 / 3) < 1e-3 and out[h][1] == 0.0


def test_hits_weight_tilts_scores(spark):
    # same shape but one edge carries 3x weight: that hub and its
    # authority dominate
    out = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            _edges(spark, [(1, 8, 3), (2, 9, 1)]), iters=3
        ).collect()
    }
    assert out[1][0] > out[2][0]
    assert out[8][1] > out[9][1]


def test_hits_l1_mass_and_zero_sides(spark):
    # L1 totals stay ~UNIT (quantized-divisor normalization), and a
    # pure-source node has authority exactly 0 / pure-sink hub 0
    res = hits(_edges(spark, [(1, 2, 1), (2, 3, 2), (1, 3, 1)]), iters=4)
    rows = res.collect()
    tot_h = sum(int(round(r["hub"] * UNIT)) for r in rows)
    tot_a = sum(int(round(r["authority"] * UNIT)) for r in rows)
    assert abs(tot_h - UNIT) <= len(rows) + 1
    assert abs(tot_a - UNIT) <= len(rows) + 1
    by = {r["node"]: r for r in rows}
    assert by[1]["authority"] == 0.0  # no in-edges
    assert by[3]["hub"] == 0.0  # no out-edges


def test_hits_rejects_zero_iters(spark):
    try:
        hits(_edges(spark, [(1, 2, 1)]), iters=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def _ticks(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (s, base + dt.timedelta(minutes=i), i, p, v)
            for (s, i, p, v) in rows
        ],
        "symbol string, timestamp timestamp, event_id bigint, "
        "current_price double, total_volume double",
    )


def test_obv_hand_computed_path(spark):
    # prices 10 -> 12 -> 11 -> 11 with volumes 1,2,3,4:
    #   dir: 0, +1, -1, 0   signed cents: 0, +200, -300, 0
    #   run: 0, 200, -100, -100
    rows = [("btc", 0, 10.0, 1.0), ("btc", 1, 12.0, 2.0),
            ("btc", 2, 11.0, 3.0), ("btc", 3, 11.0, 4.0)]
    (r,) = obv(
        _ticks(spark, rows), key="symbol",
        order_by=["timestamp", "event_id"],
        price="current_price", volume="total_volume",
    ).collect()
    assert r["n_ticks"] == 4
    assert r["obv_cents"] == -100
    assert r["obv_max_cents"] == 200
    assert r["obv_min_cents"] == -100
    assert r["obv"] == -1.0


def test_obv_null_volume_ticks_drop_out_of_the_chain(spark):
    # the NULL-volume middle tick is removed BEFORE the lag chain, so
    # the 3rd tick compares against the 1st: 10 -> (null) -> 9 is a
    # down-tick
    rows = [("eth", 0, 10.0, 5.0), ("eth", 1, 20.0, None),
            ("eth", 2, 9.0, 7.0)]
    (r,) = obv(
        _ticks(spark, rows), key="symbol",
        order_by=["timestamp", "event_id"],
        price="current_price", volume="total_volume",
    ).collect()
    assert r["n_ticks"] == 2
    assert r["obv_cents"] == -700


def test_obv_keys_fold_independently(spark):
    rows = [("a", 0, 1.0, 1.0), ("b", 0, 1.0, 1.0),
            ("a", 1, 2.0, 1.0), ("b", 1, 0.5, 1.0)]
    got = {
        r["symbol"]: r["obv_cents"]
        for r in obv(
            _ticks(spark, rows), key="symbol",
            order_by=["timestamp", "event_id"],
            price="current_price", volume="total_volume",
        ).collect()
    }
    assert got == {"a": 100, "b": -100}


def test_global_shuffle_positions_are_contiguous_per_shard(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.sampling import (
        q_doc_global_shuffle,
    )

    out = q_doc_global_shuffle(spark, SF_SMALL).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        ps.sort()
        assert ps == list(range(1, len(ps) + 1)), f"shard {shard} has gaps"
    # every doc assigned exactly once
    assert len(out) == len({r["doc_id"] for r in out})


def test_chi2_scores_are_nonnegative_and_ranked(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_chi2_terms,
    )

    rows = q_doc_chi2_terms(spark, SF_SMALL).collect()
    assert rows, "expected at least one ranked term"
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r["chi2"] >= 0.0
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rnk"])
        chis = [r["chi2"] for r in rs]
        assert chis == sorted(chis, reverse=True), lang


def test_hits_plan_edges_never_shuffle(spark):
    # the per-round joins must broadcast the score side: no Exchange
    # on the edge relation after its build (the pagerank plan pin)
    edges = _edges(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 2)])
    plan = hits(edges, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
