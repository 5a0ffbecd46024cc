"""Round-9 structured-review fixes over the long-stable operator files
(windows/stats/catalog): NULL-coordinate and collision edge cases the
populated null-free fixtures can never reach, plus the float-aliasing
skyline prune and the recover_swap concurrent-writer hazard."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# asof_join_nearest: a NULL event timestamp has no as-of position
# ---------------------------------------------------------------------------


def test_asof_nearest_null_event_ts_gets_no_match(spark):
    from real_time_stream_processing_engine_spark.operators.windows import (
        asof_join_nearest,
    )

    ts = datetime.datetime(2024, 1, 10, 12, 0, 0)
    events = spark.createDataFrame(
        [(1, 5, ts), (2, 5, None)],
        "event_id long, user_id long, ts timestamp",
    )
    orders = spark.createDataFrame(
        [(6, datetime.date(2024, 1, 8))],  # o_custkey 6 -> user_id 5
        "o_custkey long, o_orderdate date",
    )
    got = {r.event_id: (r.nearest_order_epoch, r.gap_s)
           for r in asof_join_nearest(events, orders).collect()}
    assert got[1][0] is not None  # the real event matches
    # the timestamp-less event used to be handed the user's EARLIEST
    # order by the forward carry — it must match nothing
    assert got[2] == (None, None)


# ---------------------------------------------------------------------------
# interval_concurrency: NULL bounds excluded, never a NULL bucket
# ---------------------------------------------------------------------------


def test_interval_concurrency_ignores_null_bounds(spark):
    from real_time_stream_processing_engine_spark.operators.windows import (
        interval_concurrency,
    )

    clean = spark.createDataFrame(
        [(0, 25), (10, 35)], "start_sec long, end_sec long"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(50, None), (None, 7)], "start_sec long, end_sec long"
        )
    )
    want = {
        (r.bucket_start, r.max_concurrent)
        for r in interval_concurrency(clean, bucket_sec=10).collect()
    }
    got_rows = interval_concurrency(dirty, bucket_sec=10).collect()
    # no spurious bucket_start=NULL row, and the one-sided NULLs'
    # unmatched deltas must not shift any real bucket's carry
    assert all(r.bucket_start is not None for r in got_rows)
    assert {(r.bucket_start, r.max_concurrent) for r in got_rows} == want


# ---------------------------------------------------------------------------
# mann_whitney_u / ks_statistic: NULLs are missing data, not a rank
# ---------------------------------------------------------------------------


def test_mann_whitney_ignores_null_values(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        mann_whitney_u,
    )

    vals = [(v,) for v in range(1, 91)]
    a = spark.createDataFrame(vals + [(None,)] * 10, "v long")
    b = spark.createDataFrame(vals, "v long")
    row = mann_whitney_u(a, b).head()
    # identical non-null distributions: na counts REAL observations
    # and the effect size is exactly 0 (ties fold 2U+T to na*nb)
    assert row.na == 90 and row.nb == 90
    assert row.rank_biserial_ppm == 0


def test_ks_ignores_null_values(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        ks_statistic,
    )

    vals = [(v,) for v in range(1, 101)]
    a = spark.createDataFrame(vals + [(None,)] * 10, "v long")
    b = spark.createDataFrame(vals, "v long")
    row = ks_statistic(a, b).head()
    # one-sided nulls used to be a spurious first CDF step -> ks > 0
    assert row.na == 100 and row.nb == 100
    assert row.ks_ppm == 0


# ---------------------------------------------------------------------------
# decile_table: cum at the boundary ROW, not the bucket's interior max
# ---------------------------------------------------------------------------


def test_decile_table_boundary_cum_with_negative_sums(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        decile_table,
    )

    # ascending-rank running sums that DIP: values [-5, 1, 1, 1] give
    # cum [-5, -4, -3, -2]; with n_points=2 bucket 1 is ranks 1-2 whose
    # boundary cum is -4 (max('cum') would also say -4 here, so make
    # bucket 2 dip: values [..., -1, 3] -> cum [-3, 0]); boundary row
    # rk=4 has cum 0 == interior max, so craft a real divergence:
    # bucket 2 = ranks 3-4 with cums [5, 2] (value +8 then -3):
    rows = [
        (1, -5, 4, 2),
        (2, -4, 4, 2),
        (3, 5, 4, 2),   # interior maximum of bucket 2
        (4, 2, 4, 2),   # the d=2 boundary row: cum_share from THIS row
    ]
    r = spark.createDataFrame(rows, "rk long, cum long, n long, tot long")
    got = {x.decile: (x.n_cum, x.cum) for x in decile_table(r, 2).collect()}
    assert got[1] == (2, -4)
    # max('cum') would report 5; the boundary row's running sum is 2
    assert got[2] == (4, 2)


# ---------------------------------------------------------------------------
# asof_join: duplicate OUTPUT names refused ('ts' in value_cols)
# ---------------------------------------------------------------------------


def test_asof_join_refuses_duplicate_output_names(spark):
    from real_time_stream_processing_engine_spark.operators.windows import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 2.0)],
        "k long, ts timestamp, val double",
    )
    with pytest.raises(ValueError, match="emitted twice"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["ts", "val"])
    with pytest.raises(ValueError, match="emitted twice"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["val", "val"])


# ---------------------------------------------------------------------------
# skyline_2d: phase-1 prune conservative past 2^53 (float aliasing)
# ---------------------------------------------------------------------------


def test_skyline_prune_conservative_past_2_53(spark):
    from real_time_stream_processing_engine_spark.operators.windows import (
        skyline_2d,
    )

    big = 1 << 53  # float(2^53 + 1) == float(2^53)
    # (m=0, X=big) and (m=100, X=big+1): the second is a TRUE frontier
    # row (strictly higher X than everything at lower m) whose double
    # aliases onto the lower cell's prefix max — the old strict-> prune
    # killed it before the exact sweep
    rows = [(0, big), (100, big + 1)]
    df = spark.createDataFrame(rows, "m long, x long")
    got = {(r.m, r.x) for r in skyline_2d(df, "m", "x", n_bins=4).collect()}
    assert got == {(0, big), (100, big + 1)}


# ---------------------------------------------------------------------------
# distributed_cumsum: output/helper collisions refused at entry
# ---------------------------------------------------------------------------


def test_distributed_cumsum_refuses_column_collisions(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        distributed_cumsum,
    )

    df = spark.createDataFrame([(1, 2, 3)], "k long, v long, cum long")
    with pytest.raises(ValueError, match="cum"):
        distributed_cumsum(df, ["k"], "v")
    df2 = spark.createDataFrame([(1, 2, 3)], "k long, v long, _off_n long")
    with pytest.raises(ValueError, match="_off_n"):
        distributed_cumsum(df2, ["k"], "v")


def test_quantile_crossings_ignore_null_values(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        grouped_quantile_crossings,
    )

    vals = [("g", v) for v in range(1, 101)]
    clean = spark.createDataFrame(vals, "grp string, v long")
    dirty = clean.unionByName(
        spark.createDataFrame([("g", None)] * 30, "grp string, v long")
    )
    want = grouped_quantile_crossings(clean, "grp", "v").head()
    got = grouped_quantile_crossings(dirty, "grp", "v").head()
    # 30% nulls used to inflate n and drag both crossings to earlier
    # real values; complete-case must make the null share invisible
    assert (got.n, got.p10, got.p90) == (want.n, want.p10, want.p90) == (100, 10, 90)


def test_lorenz_ignores_null_entity_sums(spark):
    from real_time_stream_processing_engine_spark.operators.stats import (
        lorenz_points,
    )

    rows = [(k, (k + 1) * 10) for k in range(20)]
    clean = spark.createDataFrame(rows, "o_custkey long, s long")
    dirty = clean.unionByName(
        spark.createDataFrame([(99, None), (98, None)], "o_custkey long, s long")
    )
    want = {(r.decile, r.n_cum, r.cum_share_ppm)
            for r in lorenz_points(clean).collect()}
    got = {(r.decile, r.n_cum, r.cum_share_ppm)
           for r in lorenz_points(dirty).collect()}
    # NULL-sum entities used to be RANKED (shifting every boundary)
    # while contributing nothing to cum — they must be invisible
    assert got == want
