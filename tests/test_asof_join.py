"""Unit semantics for the general as-of join (q48 pins the backward+
tolerance path against the DuckDB oracle; these pin the rest on a tiny
literal frame)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.windows import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-10 12:00:00")),
            (2, "u1", _ts("2024-01-20 12:00:00")),
            (3, "u2", _ts("2024-01-05 00:00:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-10 12:00:00"), 100.0),  # exactly at e1
            ("u1", _ts("2024-01-12 00:00:00"), 200.0),
            ("u2", _ts("2024-01-08 00:00:00"), 300.0),  # after e3 only
        ],
        "user_id string, rts timestamp, price double",
    )
    return left, right


def _rows(df):
    return {
        r.event_id: (r.asof_ts, r.asof_price)
        for r in df.select("event_id", "asof_ts", "asof_price").collect()
    }


def test_backward_inclusive_and_unmatched_null(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(left, right, "user_id", "ts", "rts", ["price"], direction="backward")
    )
    e = lambda s: int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[1] == (e("2024-01-10 12:00:00"), 100.0)  # at-or-before is inclusive
    assert got[2] == (e("2024-01-12 00:00:00"), 200.0)  # nearest preceding wins
    assert got[3] == (None, None)  # u2's only order is in the future


def test_forward_direction(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(left, right, "user_id", "ts", "rts", ["price"], direction="forward")
    )
    e = lambda s: int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[1] == (e("2024-01-10 12:00:00"), 100.0)  # at-or-after inclusive
    assert got[2] == (None, None)  # nothing after e2
    assert got[3] == (e("2024-01-08 00:00:00"), 300.0)  # nearest following


def test_tolerance_nulls_out_far_matches(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left, right, "user_id", "ts", "rts", ["price"],
            direction="backward", tolerance_s=3 * 24 * 3600,
        )
    )
    e = lambda s: int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[1] == (e("2024-01-10 12:00:00"), 100.0)  # within 3 days
    assert got[2] == (None, None)  # nearest preceding is 8.5 days back
    assert got[3] == (None, None)


def test_right_ts_ties_break_deterministically(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-02 00:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 00:00:00"), p) for p in (5.0, 9.0, 1.0)],
        "user_id string, rts timestamp, price double",
    )
    got = _rows(asof_join(left, right, "user_id", "ts", "rts", ["price"]))
    # lexical-max struct wins the tie: highest price at the tied ts
    assert got[1][1] == 9.0


def test_bad_direction_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "user_id", "ts", "rts", ["price"], direction="nearest")


def test_null_right_timestamps_never_match(spark):
    """A right row with a null timestamp must not be carried as a
    phantom match onto unmatched left rows."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-02 00:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", None, 99.0)], "user_id string, rts timestamp, price double"
    )
    got = _rows(asof_join(left, right, "user_id", "ts", "rts", ["price"]))
    assert got[1] == (None, None)


def test_asof_forward_null_left_ts_stays_unmatched(spark):
    """r5 review: forward direction sorted NULL left timestamps last,
    handing them the minimum-ts right row; they must keep nulls."""
    from real_time_stream_processing_engine_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, None)], "k long, lt string"
    ).select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 11:00:00", 7.0)], "k long, rt string, v double"
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "v")
    rows = {
        (r.k, r.lt is not None): (r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, "k", "lt", "rt", ["v"], direction="forward"
        ).collect()
    }
    assert rows[(1, True)][1] == 7.0       # real row matches forward
    assert rows[(1, False)] == (None, None)  # null-ts row stays unmatched
