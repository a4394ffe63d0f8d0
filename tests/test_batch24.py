"""Unit tests for the batch-24 operators: n-gram novelty, bot
screen, volume profile, centroid-margin label noise, and customer
migration.  Query-level equivalence vs DuckDB is the oracle
harness's job (check_oracle-certified at sf0.01 and sf0.1 this
round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_ngram_novelty_bounds(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.text import (
        q_doc_ngram_novelty,
    )

    rows = q_doc_ngram_novelty(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_shingles"]
        assert 0 <= r["unique_shingles"] <= r["n_shingles"]
        assert r["novelty_ppm"] == r["unique_shingles"] * 1_000_000 // r["n_shingles"]


def test_exact_duplicate_docs_have_zero_novelty(spark, monkeypatch):
    from crypto_price_tracker_with_etl_dashboard_spark.queries import text as TXT

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en", "s", 25),
            (2, "the quick brown fox jumps", "en", "s", 25),
            (3, "a totally different sentence here", "en", "s", 33),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(TXT, "load_table", lambda s, d, n: df)
    got = {r["doc_id"]: r for r in TXT.q_doc_ngram_novelty(spark, "x").collect()}
    assert got[1]["novelty_ppm"] == 0 and got[2]["novelty_ppm"] == 0
    assert got[3]["novelty_ppm"] == 1_000_000


def test_bot_screen_metrics_are_consistent(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        q_events_bot_screen,
    )

    rows = q_events_bot_screen(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_hourly"] <= r["n_events"]
        assert 0 <= r["rapid_followups"] <= max(0, r["n_events"] - 1)
        assert 0 <= r["rapid_ppm"] <= 1_000_000
        assert 0 < r["top_type_ppm"] <= 1_000_000
        expect = (
            r["peak_hourly"] >= 60
            or r["rapid_ppm"] >= 500_000
            or r["top_type_ppm"] >= 950_000
        )
        assert r["bot_flag"] == expect


def test_volume_profile_partitions_all_ticks(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.finance import (
        q_prices_volume_profile,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import (
        prices_from_events,
    )

    rows = q_prices_volume_profile(spark, SF_SMALL).collect()
    assert rows
    assert all(0 <= r["band"] <= 9 for r in rows)
    binned = sum(r["n_ticks"] for r in rows)
    src = (
        prices_from_events(spark, SF_SMALL)
        .filter((F.col("current_price") > 0) & (F.col("total_volume") > 0))
        .count()
    )
    assert binned == src


def test_centroid_margin_flags_match_sign(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.vector import (
        q_emb_centroid_margin,
    )

    rows = q_emb_centroid_margin(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["suspect"] == (r["margin_usq"] < 0)
        assert r["nearest_other"] != r["label"]


def test_customer_migration_counts_balance(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_customer_migration,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    rows = q_orders_customer_migration(spark, SF_SMALL).collect()
    assert rows
    bands = {"low", "mid", "high"}
    for r in rows:
        assert r["band_from"] in bands | {"new"}
        assert r["band_to"] in bands | {"churned"}
        assert not (r["band_from"] == "new" and r["band_to"] == "churned")
    # outflow of year Y (non-new rows) = customers active in Y (< max)
    orders = load_table(spark, SF_SMALL, "orders")
    active = {
        (r["yr"], r["n"])
        for r in orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    max_yr = max(y for y, _ in active)
    per_year = {}
    for r in rows:
        if r["band_from"] != "new":
            per_year[r["yr"]] = per_year.get(r["yr"], 0) + r["n_customers"]
    for yr, n in active:
        if yr < max_yr:
            assert per_year.get(yr, 0) == n
