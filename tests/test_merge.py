"""MERGE INTO / CDC apply (operators/merge.py): row-level semantics
on hand-built change sets, the ANSI cardinality rejection, keep-last
sequence resolution, and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pytest

from crypto_price_tracker_with_etl_dashboard_spark.operators.merge import (
    merge_upsert,
    sql_merge_upsert,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "val"],
    )


def test_insert_update_delete_semantics(spark):
    updates = spark.createDataFrame(
        [
            (2, "B", 99.0, "U"),   # update
            (3, "c", 30.0, "D"),   # delete
            (4, "d", 40.0, "I"),   # insert
        ],
        ["k", "name", "val", "op"],
    )
    out = {
        r["k"]: (r["name"], r["val"])
        for r in merge_upsert(_target(spark), updates, "k").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}


def test_duplicate_updates_rejected_without_seq(spark):
    updates = spark.createDataFrame(
        [(2, "x", 1.0, "U"), (2, "y", 2.0, "U")], ["k", "name", "val", "op"]
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_upsert(_target(spark), updates, "k")


def test_seq_resolves_keep_last_and_delete_wins_later(spark):
    updates = spark.createDataFrame(
        [
            (2, "early", 1.0, "U", 1),
            (2, "late", 2.0, "U", 5),   # highest seq wins
            (3, "gone", 0.0, "U", 1),
            (3, "gone", 0.0, "D", 2),   # later delete wins
            (1, "zombie", 9.0, "D", 1),
            (1, "revived", 8.0, "U", 1),  # same seq: upsert beats delete
        ],
        ["k", "name", "val", "op", "seq"],
    )
    out = {
        r["k"]: (r["name"], r["val"])
        for r in merge_upsert(_target(spark), updates, "k", seq_col="seq").collect()
    }
    assert out == {1: ("revived", 8.0), 2: ("late", 2.0)}


def test_duckdb_twin_parity(spark):
    rows_t = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
    rows_u = [
        (2, "B", 99.0, "U", 1),
        (3, "c", 30.0, "D", 1),
        (4, "d", 40.0, "I", 1),
        (4, "d2", 41.0, "U", 2),
    ]
    t = spark.createDataFrame(rows_t, ["k", "name", "val"])
    u = spark.createDataFrame(rows_u, ["k", "name", "val", "op", "seq"])
    got = sorted(
        (r["k"], r["name"], r["val"])
        for r in merge_upsert(t, u, "k", seq_col="seq").collect()
    )
    tv = ", ".join(f"({k},'{n}',{v})" for k, n, v in rows_t)
    uv = ", ".join(f"({k},'{n}',{v},'{o}',{s})" for k, n, v, o, s in rows_u)
    sql = sql_merge_upsert(
        f"target AS (SELECT * FROM (VALUES {tv}) t(k, name, val))",
        f"updates AS (SELECT * FROM (VALUES {uv}) u(k, name, val, op, seq))",
        "k",
        ["name", "val"],
        seq_col="seq",
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want


def test_missing_payload_column_rejected(spark):
    updates = spark.createDataFrame([(2, "B", "U")], ["k", "name", "op"])
    with pytest.raises(ValueError, match="missing payload"):
        merge_upsert(_target(spark), updates, "k")
