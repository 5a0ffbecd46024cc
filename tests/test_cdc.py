"""apply_upsert (MERGE semantics) unit-pinned on tiny literal frames."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators.cdc import apply_upsert


@pytest.fixture(scope="module")
def frames(spark):
    target = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k: long, name: string, bal: double",
    )
    updates = spark.createDataFrame(
        [(2, 99.0, "new-bob"), (4, 40.0, "dave")],
        "k: long, new_bal: double, new_name: string",
    )
    return target, updates


def _run(target, updates, **kw):
    out = apply_upsert(
        target,
        updates,
        key_cols=["k"],
        set_cols={"bal": "new_bal"},
        insert_only_cols={"name": "new_name"},
        **kw,
    )
    return {r["k"]: (r["name"], r["bal"], r["op"]) for r in out.collect()}


def test_update_insert_keep(frames):
    target, updates = frames
    got = _run(target, updates)
    assert got == {
        1: ("alice", 10.0, "keep"),
        2: ("bob", 99.0, "update"),  # bal updated, name NOT touched
        3: ("carol", 30.0, "keep"),
        4: ("dave", 40.0, "insert"),  # insert_only_cols seed the new row
    }


def test_op_col_droppable(frames):
    target, updates = frames
    out = apply_upsert(
        target, updates, key_cols=["k"], set_cols={"bal": "new_bal"}, op_col=None
    )
    assert out.columns == target.columns


def test_unset_target_cols_null_on_insert(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0, "x")], "k: long, name: string, bal: double, extra: string"
    )
    updates = spark.createDataFrame([(2, 2.0)], "k: long, new_bal: double")
    out = apply_upsert(target, updates, key_cols=["k"], set_cols={"bal": "new_bal"})
    row = {r["k"]: r for r in out.collect()}[2]
    assert row["name"] is None and row["extra"] is None and row["bal"] == 2.0


@pytest.fixture(scope="module")
def vframes(spark):
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)],
        "k: long, name: string, bal: double",
    ).select(
        "*",
        F.lit(None).cast("long").alias("ver_a"),
        F.lit(None).cast("long").alias("ver_b"),
    )
    # two change batches for key 1: b2 is NEWER than b1
    b1 = spark.createDataFrame(
        [(1, 100.0, "x", 5, 1)], "k: long, nb: double, nn: string, va: long, vb: long"
    )
    b2 = spark.createDataFrame(
        [(1, 200.0, "y", 9, 1)], "k: long, nb: double, nn: string, va: long, vb: long"
    )
    return target, b1, b2


def _vapply(target, batch):
    from real_time_stream_processing_engine_spark.operators.cdc import (
        apply_upsert_versioned,
    )

    return apply_upsert_versioned(
        target,
        batch,
        key_cols=["k"],
        set_cols={"bal": "nb"},
        version_cols={"ver_a": "va", "ver_b": "vb"},
        insert_only_cols={"name": "nn"},
    )


def _state(df):
    return {r["k"]: (r["bal"], r["ver_a"], r["ver_b"]) for r in df.collect()}


def test_versioned_out_of_order_batches_commute(vframes):
    target, b1, b2 = vframes
    in_order = _state(_vapply(_vapply(target, b1), b2))
    reversed_ = _state(_vapply(_vapply(target, b2), b1))
    assert in_order == reversed_ == {1: (200.0, 9, 1), 2: (20.0, None, None)}


def test_versioned_redelivery_is_noop(vframes):
    target, b1, _ = vframes
    once = _vapply(target, b1)
    twice = _vapply(once, b1)  # equal version must NOT re-apply
    assert _state(once) == _state(twice) == {1: (100.0, 5, 1), 2: (20.0, None, None)}


def test_versioned_insert_then_older_update_ignored(spark, vframes):
    target, b1, b2 = vframes
    new_key = spark.createDataFrame(
        [(7, 70.0, "g", 3, 0)], "k: long, nb: double, nn: string, va: long, vb: long"
    )
    older = spark.createDataFrame(
        [(7, 60.0, "h", 1, 0)], "k: long, nb: double, nn: string, va: long, vb: long"
    )
    got = _state(_vapply(_vapply(target, new_key), older))
    assert got[7] == (70.0, 3, 0)  # the older change lost


def test_versioned_upsert_null_version_update_refused(spark):
    """A matched update whose version component is NULL would silently
    never apply (NULL > struct is NULL) — refused loudly instead; keep
    rows (target-only, whose _u_* are NULL by full-outer construction)
    must NOT trip the guard (r8 review)."""
    import pytest
    from pyspark.sql import functions as F

    from real_time_stream_processing_engine_spark.operators.cdc import (
        apply_upsert_versioned,
    )

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, ver long"
    )
    # keep-only target rows alongside a clean update: no raise
    ok = apply_upsert_versioned(
        target,
        spark.createDataFrame([(1, "a2", 11)], "k long, nv string, nver long"),
        key_cols=["k"],
        set_cols={"v": "nv"},
        version_cols={"ver": "nver"},
    )
    assert {(r.k, r.v, r.ver) for r in ok.collect()} == {
        (1, "a2", 11),
        (2, "b", 20),
    }
    # a NULL-version matched update raises instead of silently freezing
    bad = apply_upsert_versioned(
        target,
        spark.createDataFrame(
            [(1, "a3", None)], "k long, nv string, nver long"
        ),
        key_cols=["k"],
        set_cols={"v": "nv"},
        version_cols={"ver": "nver"},
    )
    with pytest.raises(Exception, match="NULL version"):
        bad.collect()
