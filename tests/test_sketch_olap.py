"""Count-min sketch (functions/sketch.py) and the r6 OLAP additions
(grouping sets, fixed-width histogram): structural guarantees the
oracle rows can't express — the CMS overestimate invariant, sketch
size bounds, histogram mass conservation — plus plan pins for the
constant-size-shuffle shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.sketch import (
    cms_build,
    cms_estimate,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def keyed(spark):
    rows = [(i % 13,) for i in range(400)] + [(99,)] * 57
    return spark.createDataFrame(rows, ["k"])


def test_cms_never_underestimates(spark, keyed):
    """est >= true for EVERY key — the one-sided CMS guarantee; and
    the planted heavy key's estimate is at least its true 57."""
    sketch = cms_build(keyed, "k", depth=4, width=32)
    keys = keyed.select("k").distinct()
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, keys, "k", depth=4, width=32).collect()
    }
    true = {
        r["k"]: r["n"]
        for r in keyed.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    assert est[99] >= 57


def test_cms_size_and_mass(spark, keyed):
    """The sketch never exceeds depth*width cells, and every row of
    the grid sums to the full input count (each input row increments
    exactly one counter per row of the grid)."""
    sketch = cms_build(keyed, "k", depth=4, width=32).collect()
    assert len(sketch) <= 4 * 32
    per_row = {}
    for r in sketch:
        per_row[r["j"]] = per_row.get(r["j"], 0) + r["cnt"]
    assert per_row == {j: 457 for j in range(4)}


def test_histogram_conserves_mass_and_covers_range(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        _HIST_BUCKETS,
        q_events_histogram,
    )

    ev = load_table(spark, SF_SMALL, "events")
    n_vals = ev.filter(F.col("value").isNotNull()).count()
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    hist = q_events_histogram(spark, SF_SMALL).collect()
    assert sum(r["n"] for r in hist) == n_vals
    assert all(0 <= r["bucket"] < _HIST_BUCKETS for r in hist)
    assert min(r["lo"] for r in hist) == lo
    assert max(r["hi"] for r in hist) >= hi


def test_grouping_sets_margins_consistent(spark):
    """The grand-total row equals the sum of the (event_type, mon)
    cells AND the sum of the dow margin — the defining identity of
    the three grouping sets."""
    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_events_grouping_sets,
    )

    rows = q_events_grouping_sets(spark, SF_SMALL).collect()
    cells = [r for r in rows if r["g_type"] == 0 and r["g_mon"] == 0]
    dow_margin = [r for r in rows if r["g_dow"] == 0]
    total = [r for r in rows if r["g_type"] and r["g_mon"] and r["g_dow"]]
    assert len(total) == 1
    assert sum(r["n_events"] for r in cells) == total[0]["n_events"]
    assert sum(r["n_events"] for r in dow_margin) == total[0]["n_events"]


def test_cms_build_shuffles_constant_rows(spark, keyed):
    """Plan shape: the sketch aggregate has a map-side partial
    (the exchange carries <= depth*width rows per task, constant in
    the input) — and the estimate side broadcasts the sketch."""
    from tests.test_plans import plan_of

    sketch = cms_build(keyed, "k", depth=4, width=32)
    plan = plan_of(sketch)
    assert plan.count("HashAggregate") >= 2  # partial + final
    est = cms_estimate(sketch, keyed.select("k").distinct(), "k", depth=4, width=32)
    assert "BroadcastHashJoin" in plan_of(est)


def test_cms_merge_equals_whole_input_sketch(spark, keyed):
    """Linearity: sketch(A) + sketch(B) == sketch(A union B), cell
    for cell — the property that makes the sketch distributable."""
    from crypto_price_tracker_with_etl_dashboard_spark.functions.sketch import (
        cms_merge,
    )

    a = keyed.filter(F.col("k") < 7)
    b = keyed.filter(F.col("k") >= 7)
    sa = cms_build(a, "k", depth=4, width=32)
    sb = cms_build(b, "k", depth=4, width=32)
    merged = {
        (r["j"], r["bucket"]): r["cnt"] for r in cms_merge(sa, sb).collect()
    }
    whole = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(keyed, "k", depth=4, width=32).collect()
    }
    assert merged == whole


def test_histogram_constant_column_single_bucket(spark):
    """width == 0 (constant column) pins every row to bucket 0
    instead of diverging through NaN floor/least semantics."""
    import crypto_price_tracker_with_etl_dashboard_spark.queries.olap as olap

    ev = spark.createDataFrame([(5.0,)] * 9, ["value"])
    bounds = ev.agg(F.min("value").alias("__lo"), F.max("value").alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / olap._HIST_BUCKETS
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("__lo")) / width),
            F.lit(olap._HIST_BUCKETS - 1),
        )
    ).cast("bigint")
    out = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .count()
        .collect()
    )
    assert [(r["bucket"], r["count"]) for r in out] == [(0, 9)]


def test_basket_affinity_lift_semantics(spark, tmp_path):
    """Lift on a hand-built basket set: parts co-occurring MORE than
    independence predicts get lift > 1e6 ppm, exactly computed.
    Baskets: {1,2} {1,2} {3,4} {3,5} -> pair (1,2) support 2,
    n_1 = n_2 = 2, N = 4 -> lift = 2*4/(2*2) = 2.0 (2_000_000 ppm)."""
    import os

    from crypto_price_tracker_with_etl_dashboard_spark.queries.olap import (
        q_orders_basket_affinity,
    )

    rows = []
    for o, parts in enumerate([[1, 2], [1, 2], [3, 4], [3, 5]], start=1):
        for p in parts:
            rows.append((o, p))
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    out = q_orders_basket_affinity(spark, d).collect()
    assert [(r["part_a"], r["part_b"], r["support"], r["lift_ppm"]) for r in out] == [
        (1, 2, 2, 2_000_000)
    ]
