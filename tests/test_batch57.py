"""Unit tests for the batch-57 operators: cross-video duplicate-frame
detection and the forward-window view-to-purchase abandonment.
Oracle equivalence is check_oracle's job (certified at sf0.01 and
sf0.1 this round); these pin shapes and invariants."""

from __future__ import annotations

from conftest import SF_SMALL


def test_frame_dups_invariants(spark):
    from crypto_price_tracker_with_etl_dashboard_spark.queries.multimodal import (
        _FRAME_FP_HEX,
        q_media_frame_dups,
    )

    rows = q_media_frame_dups(spark, SF_SMALL).collect()
    assert rows
    space = 16 ** _FRAME_FP_HEX
    hashes = [r["phash"] for r in rows]
    assert len(hashes) == len(set(hashes))
    for r in rows:
        assert 0 <= r["phash"] < space
        # cross-video groups only, and every video contributes >= 1
        assert r["n_videos"] >= 2
        assert r["n_frames"] >= r["n_videos"]
        assert r["dedupable_frames"] == r["n_frames"] - r["n_videos"]


def test_abandonment_matches_python_reference(spark):
    """Recompute the forward-window conversion per view in Python
    from the raw events and compare the daily rollup exactly."""
    import collections
    import datetime as dt

    import pyarrow.parquet as pq

    from crypto_price_tracker_with_etl_dashboard_spark.queries.behavior import (
        _ABANDON_WINDOW_MIN,
        q_events_abandonment,
    )

    rows = {r["day"]: r for r in q_events_abandonment(spark, SF_SMALL).collect()}
    tbl = pq.read_table(
        f"{SF_SMALL}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pylist()
    by_user: dict = collections.defaultdict(list)
    for e in tbl:
        by_user[e["user_id"]].append(e)
    views = collections.Counter()
    converted = collections.Counter()
    win = dt.timedelta(minutes=_ABANDON_WINDOW_MIN)
    for evs in by_user.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        for i, e in enumerate(evs):
            if e["event_type"] != "view":
                continue
            views[e["ts"].date()] += 1
            if any(
                f["event_type"] == "purchase" and f["ts"] <= e["ts"] + win
                for f in evs[i + 1 :]
            ):
                converted[e["ts"].date()] += 1
    assert set(rows) == set(views)
    for day, n in views.items():
        r = rows[day]
        assert r["n_views"] == n
        assert r["n_converted"] == converted[day]
        assert r["abandon_ppm"] == (n - converted[day]) * 1_000_000 // n
