"""Round-9 structured-review fixes, third batch — the session-4 pass
over readers/fsmeta/sampling/cdc/graph/runner.  One genuine gap: a
TARGET row carrying a partially-NULL version slipped past both r8
guards (they cover the update and insert sides) and made a matched
merge silently wrong either way — head NULL: treated never-versioned,
any update overwrites; head set, tail NULL: u_ver > t_ver is NULL, the
row freezes forever.  The test fails on the prior code."""

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


def test_versioned_target_partial_null_version_refused(spark):
    # head set, tail NULL: the matched compare is NULL -> the row used
    # to freeze forever with no error (the r8-review class, target side)
    target = spark.createDataFrame(
        [(1, "a", 5, None)], "k long, v string, ver_a long, ver_b long"
    )
    bad = _vapply(
        target,
        spark.createDataFrame(
            [(1, "a2", 6, 0)], "k long, nv string, va long, vb long"
        ),
    )
    with pytest.raises(Exception, match="TARGET row.*PARTIALLY-NULL"):
        bad.collect()


def test_versioned_target_head_null_partial_version_refused(spark):
    # head NULL, tail set: used to read as never-versioned, so ANY
    # update — an arbitrarily old one included — silently overwrote
    target = spark.createDataFrame(
        [(1, "a", None, 7)], "k long, v string, ver_a long, ver_b long"
    )
    bad = _vapply(
        target,
        spark.createDataFrame(
            [(1, "old", 0, 0)], "k long, nv string, va long, vb long"
        ),
    )
    with pytest.raises(Exception, match="TARGET row.*PARTIALLY-NULL"):
        bad.collect()


def test_versioned_target_partial_null_on_keep_row_passes(spark):
    # keep rows never reach a merge decision: a corrupt UNMATCHED
    # target row must pass through unchanged, not trip the guard
    target = spark.createDataFrame(
        [(1, "a", 5, None), (2, "b", 3, 3)],
        "k long, v string, ver_a long, ver_b long",
    )
    out = _vapply(
        target,
        spark.createDataFrame(
            [(2, "b2", 4, 0)], "k long, nv string, va long, vb long"
        ),
    )
    got = {r.k: (r.v, r.ver_a, r.ver_b) for r in out.collect()}
    assert got == {1: ("a", 5, None), 2: ("b2", 4, 0)}


def test_versioned_target_all_null_still_never_versioned(spark):
    # the seeded-together contract is untouched: an all-NULL target
    # version stays legal and the first versioned update claims it
    target = spark.createDataFrame(
        [(1, "a", None, None)], "k long, v string, ver_a long, ver_b long"
    )
    out = _vapply(
        target,
        spark.createDataFrame(
            [(1, "v1", 1, 0)], "k long, nv string, va long, vb long"
        ),
    )
    got = {r.k: (r.v, r.ver_a, r.ver_b) for r in out.collect()}
    assert got == {1: ("v1", 1, 0)}


# ---------------------------------------------------------------------------
# samplers: NULL group values keep the default rate/factor (row-safe)
# ---------------------------------------------------------------------------


def test_mixture_sample_null_group_keeps_default_rate(spark):
    from real_time_stream_processing_engine_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else None) for i in range(1, 401)],
        "id long, grp string",
    )
    # default_rate=1.0: every NULL-group row must SURVIVE (the quiet
    # default is row-safe — no join for a NULL to fall out of)
    kept = mixture_sample(df, {"a": 0.0}, "grp", "id", default_rate=1.0)
    got = {r.grp for r in kept.collect()}
    assert got == {None}
    assert kept.count() == 200
    # default_rate=0.0: NULL-group rows follow the default out
    none_kept = mixture_sample(df, {"a": 1.0}, "grp", "id", default_rate=0.0)
    assert {r.grp for r in none_kept.collect()} == {"a"}


def test_repeat_rows_null_group_keeps_default_factor(spark):
    from real_time_stream_processing_engine_spark.operators.sampling import (
        repeat_rows,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, grp string"
    )
    out = repeat_rows(df, {"a": 3.0}, "grp", "id", default_factor=2.0)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.id, []).append(r.epoch)
    assert sorted(by_id[1]) == [1, 2, 3]  # named group factor
    assert sorted(by_id[2]) == [1, 2]     # NULL group -> default factor
    assert sorted(by_id[3]) == [1, 2]


def test_weighted_sample_null_rate_rows_excluded(spark):
    # the family's NULL-weight convention (systematic PPS and budget
    # curation document the same exclusion): NULL rate -> excluded;
    # rate >= 1 -> always kept; rate <= 0 -> never kept
    from real_time_stream_processing_engine_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 0.0), (4, 1.5), (5, -0.5)],
        "id long, rate double",
    )
    got = {r.id for r in weighted_sample(df, "rate", "id").collect()}
    assert got == {1, 4}
