"""Round-10 advice fix: when a matched row is corrupt on BOTH sides
(NULL update-version component AND partially-NULL target version), the
versioned upsert used to raise only the update-side error — the
operator would fix the feed, re-run, and only then hit the distinct
target-side error.  One combined message now names both defects so a
single repair pass covers them.  The both-sides test fails on the
prior code (its message had no TARGET mention)."""

from __future__ import annotations

import pytest


def _vapply(target, batch):
    from real_time_stream_processing_engine_spark.operators.cdc import (
        apply_upsert_versioned,
    )

    return apply_upsert_versioned(
        target,
        batch,
        key_cols=["k"],
        set_cols={"v": "nv"},
        version_cols={"ver_a": "va", "ver_b": "vb"},
    )


def test_versioned_both_sides_corrupt_names_both(spark):
    # target: partially-NULL version; update: NULL version component —
    # the combined branch must fire and name BOTH repairs
    target = spark.createDataFrame(
        [(1, "a", 5, None)], "k long, v string, ver_a long, ver_b long"
    )
    bad = _vapply(
        target,
        spark.createDataFrame(
            [(1, "a2", None, 0)], "k long, nv string, va long, vb long"
        ),
    )
    with pytest.raises(
        Exception, match="BOTH sides.*NULL version component.*PARTIALLY-NULL"
    ):
        bad.collect()


def test_versioned_update_only_corrupt_keeps_single_sided_message(spark):
    # healthy target, NULL update component: the original update-side
    # message (no BOTH) still fires — the combined branch is gated on
    # target corruption too
    target = spark.createDataFrame(
        [(1, "a", 5, 5)], "k long, v string, ver_a long, ver_b long"
    )
    bad = _vapply(
        target,
        spark.createDataFrame(
            [(1, "a2", None, 0)], "k long, nv string, va long, vb long"
        ),
    )
    with pytest.raises(Exception, match="update row carries a NULL") as ei:
        bad.collect()
    assert "BOTH sides" not in str(ei.value)


def test_versioned_target_only_corrupt_keeps_single_sided_message(spark):
    # partially-NULL target, healthy update: the original target-side
    # message (no BOTH) still fires
    target = spark.createDataFrame(
        [(1, "a", 5, None)], "k long, v string, ver_a long, ver_b long"
    )
    bad = _vapply(
        target,
        spark.createDataFrame(
            [(1, "a2", 6, 0)], "k long, nv string, va long, vb long"
        ),
    )
    with pytest.raises(Exception, match="TARGET row.*PARTIALLY-NULL") as ei:
        bad.collect()
    assert "BOTH sides" not in str(ei.value)


def test_bench_calibrate_anchor(spark):
    # the ambient anchor (r9 verdict item 4): two pinned jobs, min-of-N
    # floats, stable keys — the fields a future reader normalizes by
    import bench

    out = bench.calibrate(spark, "/root/testdata/sf0.001", reps=1)
    assert set(out) == {"scan_agg", "string_pass"}
    assert all(isinstance(v, float) and v > 0 for v in out.values())
