"""Unit tests for the batch-22 operators: 1-bit binary quantization
retrieval (functions/similarity.py::binary_hamming_topk), MMR
re-ranking, the seasonal-naive backtest, the open-order backlog
sweep line, and rolling WAU.  Query-level equivalence vs DuckDB is
the oracle harness's job (check_oracle-certified at sf0.01 and
sf0.1 this round)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_SMALL

from crypto_price_tracker_with_etl_dashboard_spark.functions.similarity import (
    binary_hamming_topk,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_binary_hamming_hand_computed(spark):
    # dim=32; per-dim means are 0.5 except dim0 (0.25): bits are
    # v > mean, so with these rows the codes differ only on dims 0-1
    base = [0.0] * 32
    a = list(base); a[0] = 1.0; a[1] = 1.0  # bits {0,1}
    b = list(base); b[0] = 1.0              # bits {0}
    c = list(base)                          # bits {}
    d = list(base); d[1] = 1.0              # bits {1}
    emb = _vecs(spark, [(0, a), (1, b), (2, c), (3, d)])
    out = binary_hamming_topk(
        emb, emb.filter(F.col("vec_id") == 0), dim=32, k=3
    ).collect()
    got = {(r["neighbor_id"]): (r["hamming"], r["rnk"]) for r in out}
    # query a={0,1}: b misses bit1 -> 1; d misses bit0 -> 1; c -> 2
    assert got[1] == (1, 1)  # tie on hamming, id asc
    assert got[3] == (1, 2)
    assert got[2] == (2, 3)


def test_binary_dim_must_be_word_multiple(spark):
    emb = _vecs(spark, [(0, [0.0] * 33)])
    try:
        binary_hamming_topk(emb, emb, dim=33, k=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_mmr_picks_are_distinct_pool_members(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        _MMR_K,
        _MMR_POOL,
        q_emb_mmr_rerank,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.functions import (
        similarity as S,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    out = q_emb_mmr_rerank(spark, SF_SMALL).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    emb = load_table(spark, SF_SMALL, "embeddings")
    pool = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=_MMR_POOL
    ).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in pool if r["rnk"] == 1}
    pool_sets: dict[int, set] = {}
    for r in pool:
        pool_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, picks in by_q.items():
        assert len(picks) == _MMR_K
        assert sorted(p["pick_rank"] for p in picks) == list(range(1, _MMR_K + 1))
        ids = [p["neighbor_id"] for p in picks]
        assert len(set(ids)) == _MMR_K  # no repeats
        assert set(ids) <= pool_sets[q]  # only pool members
        # rank-1 pick is the pure-relevance argmax (penalty is 0)
        first = min(picks, key=lambda p: p["pick_rank"])
        assert first["neighbor_id"] == top1[q]


def test_backtest_hand_computed(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    closes = [100.0, 101.0, 102.0, 103.0, 104.0, 105.0, 106.0, 110.0]
    for i, c in enumerate(closes):
        rows.append(("c1", base + dt.timedelta(days=i), i, c, 1.0))
    df = spark.createDataFrame(
        rows,
        "symbol string, timestamp timestamp, event_id bigint, "
        "current_price double, total_volume double",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    (r,) = FIN.q_prices_backtest_naive(spark, "unused").collect()
    # only day 8 has a 7-day-old peer: pred=100, close=110
    assert r["n_evals"] == 1
    assert r["mape_ppm"] == int(abs(110.0 - 100.0) * 1000000.0 / 110.0)


def test_backlog_starts_positive_and_drains_to_zero(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_backlog_series,
    )

    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_orders_backlog_series(spark, SF_SMALL).collect()
    assert rows, "expected a backlog series"
    assert all(r["backlog"] >= 0 for r in rows)
    # the sweep line drains to exactly the number of orders that can
    # never complete — those with NO lineitems (this synthetic SF has
    # some, unlike spec TPC-H)
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey")
    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    lineless = orders.join(li, "o_orderkey", "left_anti").count()
    assert rows[-1]["backlog"] == lineless
    # backlog is the running sum of the deltas
    run = 0
    for r in rows:
        run += r["delta"]
        assert r["backlog"] == run


def test_rolling_wau_dominates_daily_and_covers_the_spine(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_rolling_wau,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    wau = {r["day"]: r["wau"] for r in q_events_rolling_wau(spark, SF_SMALL).collect()}
    ev = load_table(spark, SF_SMALL, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    daily = {
        r["day"]: r["dau"]
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("dau"))
        .collect()
    }
    total_users = ev.select("user_id").distinct().count()
    for day, dau in daily.items():
        assert wau[day] >= dau
        assert wau[day] <= total_users
