"""bench.py budget-baseline unit tests: the REANCHORED map must be
round-scoped — a later committed round that measures faster supersedes
the re-anchor, so the regression gate re-tightens automatically."""

from __future__ import annotations

import json

import bench


def test_reanchor_superseded_by_later_faster_rounds(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"queries": {"q": 1.0}}))
    # pre-anchor round: must NOT count against the re-anchor
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"queries": {"doc_repetition": 0.152}})
    )
    base = bench._baseline_times(str(tmp_path))
    assert base["q"] == 1.0
    # no post-anchor rounds yet: the documented re-anchor holds
    assert base["doc_repetition"] == bench.REANCHORED["doc_repetition"][0]

    # a LATER round (driver envelope form) measures faster: supersede
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"queries": {"doc_repetition": 0.18, "q": 2.0}}})
    )
    base = bench._baseline_times(str(tmp_path))
    assert base["doc_repetition"] == 0.18
    assert base["q"] == 1.0  # r1 stays pinned; later slower rounds don't loosen
