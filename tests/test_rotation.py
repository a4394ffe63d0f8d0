"""Invariants of the driver-window rotation policy
(queries/__init__.py): the import-time checks already raise on
unregistered/unlisted names, a wrong-sized window, and duplicate
window entries — these tests pin the invariants a future rotation
edit could silently violate without tripping those checks."""

from __future__ import annotations

from crypto_price_tracker_with_etl_dashboard_spark.queries import (
    DRIVER_WINDOW,
    FIXED_CORE,
    NEW_THIS_ROUND,
    ORACLE_SQL,
    ROTATION_POOL,
    SPARK_QUERIES,
    current_window,
)


def test_window_is_50_unique_registered_names():
    w = current_window()
    assert len(w) == DRIVER_WINDOW
    assert len(set(w)) == DRIVER_WINDOW
    assert all(n in SPARK_QUERIES for n in w)


def test_window_is_registration_prefix():
    """The driver verifies the FIRST 50 registered queries — the
    reordering must actually put the window there."""
    assert list(SPARK_QUERIES)[:DRIVER_WINDOW] == current_window()


def test_debuts_disjoint_from_core_and_pool():
    """A debut name still in ROTATION_POOL (or FIXED_CORE) could fall
    into the live rotation slice in some future round and dedupe a
    window slot; the policy is: debuts join the pool NEXT round, at
    the consumed cursor."""
    assert not set(NEW_THIS_ROUND) & set(FIXED_CORE)
    assert not set(NEW_THIS_ROUND) & set(ROTATION_POOL)
    assert not set(FIXED_CORE) & set(ROTATION_POOL)


def test_every_window_query_has_an_oracle():
    """The driver's hard correctness gate needs a DuckDB twin for
    every window entry; a rows-only check in the window would be a
    silent downgrade."""
    missing = [n for n in current_window() if n not in ORACLE_SQL]
    assert not missing, missing


def test_pool_has_no_duplicates():
    assert len(ROTATION_POOL) == len(set(ROTATION_POOL))
