"""Smoke test for the worked training-data pipeline example: the
composition runs end to end at sf0.001 and each curation stage only
ever removes documents."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_training_data_pipeline_end_to_end(spark):
    from examples.training_data_pipeline import curate

    split, packed, stats = curate(spark, SF_SMALL)
    order = [
        "input", "after_quality_lang", "after_exact_dedup",
        "after_near_dedup", "after_decontaminate",
    ]
    counts = [stats[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    assert sum(stats["split_sizes"].values()) == stats["after_decontaminate"]
    assert stats["train_chunks"] > 0
    # split column is total: every surviving row carries exactly one
    assert split.filter("split IS NULL").count() == 0
