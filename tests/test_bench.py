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


def test_baseline_recovers_tail_only_envelope(tmp_path):
    """The r5 driver envelope has parsed=null and the bench record
    only inside the 'tail' stdout capture — _baseline_times must
    recover the queries dict (and not crash on the null parsed)."""
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"queries": {"q": 1.0}}))
    tail = (
        'c", "value": 9.9, "queries": {"q": 0.5, "w": 2.0}, '
        '"sf": 0.1, "breaches": {}}'
    )
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": None, "tail": tail})
    )
    base = bench._baseline_times(str(tmp_path))
    assert base["q"] == 1.0  # r1 pin wins
    assert base["w"] == 2.0  # recovered from the tail


def test_real_r5_envelope_parses():
    """The committed BENCH_r05.json must contribute its timings."""
    base = bench._baseline_times()
    # media_audio_decode's only r5 record lives in the tail capture
    assert any(v for n, v in base.items() if n == "emb_pq_quantize")


def test_merge_prior_min_and_breach_clearing():
    """Per-query min, breach cleared when merged timing is back under
    budget, session count incremented."""
    timings = {"a": 2.0, "b": 1.0}
    base = {"a": 1.0, "b": 1.0}
    breaches = {"a": {"suite_sec": 2.0}}
    prior = {"queries": {"a": 0.9, "b": 3.0}, "sf": 0.1, "merged_sessions": 1}
    n = bench._merge_prior(timings, breaches, base, prior, sf=0.1, git_rev=None)
    assert n == 2
    assert timings == {"a": 0.9, "b": 1.0}
    assert breaches == {}  # a's merged 0.9 <= BUDGET_FACTOR * 1.0


def test_merge_prior_refuses_cross_sf_and_cross_rev():
    import pytest

    with pytest.raises(SystemExit, match="across scales"):
        bench._merge_prior({}, {}, {}, {"sf": 0.01}, sf=0.1, git_rev=None)
    with pytest.raises(SystemExit, match="across code versions"):
        bench._merge_prior(
            {}, {}, {}, {"sf": 0.1, "git_rev": "aaa"}, sf=0.1, git_rev="bbb"
        )
    # missing sf/rev in an old-format prior: tolerated (single-session
    # artifacts predating the fields)
    n = bench._merge_prior({}, {}, {}, {"queries": {}}, sf=0.1, git_rev="bbb")
    assert n == 2


def test_merge_prior_warns_on_prior_only_names(capsys):
    timings = {"a": 1.0}
    bench._merge_prior(
        timings, {}, {}, {"sf": 0.1, "queries": {"gone": 0.5}}, sf=0.1,
        git_rev=None,
    )
    assert "gone" in capsys.readouterr().err
    assert "gone" not in timings
