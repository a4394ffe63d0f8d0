"""Unit + plan tests for the batch-18 operators: power-iteration top
principal direction (functions/decomp.py).  Query-level equivalence
vs DuckDB is the oracle harness's job."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.functions.decomp import (
    power_iteration_top_pc,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )


def test_power_iteration_finds_dominant_direction(spark):
    # rows concentrated along (3, 4)/5: the top PC must align with it
    base = [3.0, 4.0, 0.0, 0.0]
    vecs = [[x * s for x in base] for s in (1.0, 2.0, -1.5, 0.5, 1.0)]
    vecs.append([0.0, 0.0, 0.1, 0.0])  # tiny off-axis noise
    out = {
        r["dim_idx"]: r["loading"]
        for r in power_iteration_top_pc(_emb(spark, vecs), dim=4, iters=3).collect()
    }
    v = [out[i] for i in range(1, 5)]
    # direction is defined up to sign
    cos = abs(v[0] * 0.6 + v[1] * 0.8)
    assert cos > 0.999
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3


def test_power_iteration_unit_norm_output(spark):
    vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 10.0]]
    out = power_iteration_top_pc(_emb(spark, vecs), dim=3, iters=2).collect()
    assert len(out) == 3
    nrm = math.sqrt(sum(r["loading"] ** 2 for r in out))
    assert abs(nrm - 1.0) < 1e-3


def test_power_iteration_rejects_bad_iters(spark):
    with pytest.raises(ValueError):
        power_iteration_top_pc(_emb(spark, [[1.0, 0.0]]), dim=2, iters=0)


def test_power_iteration_ragged_input_raises(spark):
    df = _emb(spark, [[1.0, 2.0]]).union(
        _emb(spark, [[1.0, 2.0, 3.0]]).withColumn(
            "vec_id", F.col("vec_id") + 10
        )
    )
    with pytest.raises(Exception):
        # ragged dims surface either as the operator's own dim-count
        # guard (multi-round) or as a dimension-sum mismatch
        rows = power_iteration_top_pc(df, dim=2, iters=3).collect()
        assert len(rows) == 2  # pragma: no cover - must not be reached


def test_dim_sums_single_shuffle(spark):
    from tests.test_plans import plan_of
    from crypto_price_tracker_with_etl_dashboard_spark.functions.decomp import (
        _dim_sums,
    )

    df = _emb(spark, [[1.0, 2.0], [3.0, 4.0]])
    plan = plan_of(_dim_sums(df, "embedding", [1.0, 0.0]))
    # per-dimension sums partial-aggregate map-side onto <= dim groups
    assert plan.count("Exchange") <= 1
    assert "partial_sum" in plan
