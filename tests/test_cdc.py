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
