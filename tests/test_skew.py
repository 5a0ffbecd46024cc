"""Hot-key skew: the UNSALTED paths must survive a power user.

q75/q82 prove the salted tools; the r3 verdict asked for the converse —
evidence that the plain per-key operators (sessionization q24, rolling
RANGE window q66) stay CORRECT when one user owns half the corpus, and
that AQE's skew-join splitting actually fires on a skewed shuffle join.

Fixture: 20k events where user 0 holds 50% and 100 other users share
the rest — the one-user-with-half-the-traffic shape.  Correctness is
differential (DuckDB window SQL over the same parquet); the AQE pin
reads ``skew=true`` off the executed adaptive plan.

Scale note: a window/sessionize partition CANNOT be split by AQE (all
of a key's rows must be co-sorted), so the unsalted guarantee at 100 TB
is correctness-via-spill (external sort), with the documented
mitigations (AQE for joins, per-user day pre-split / salting for
aggregation) as the performance levers.  These tests pin the
correctness half of that contract.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.windows import sessionize
from tests.oracle import compare

N_TOTAL = 20_000
GAP_SEC = 1800


@pytest.fixture(scope="module")
def skewed_events(spark, tmp_path_factory):
    """events-shaped frame: user 0 owns 50% of rows, users 1..100 the
    rest; timestamps interleave so the hot user's sessions overlap
    everyone else's.  Deterministic (pure column arithmetic, no rand)."""
    path = str(tmp_path_factory.mktemp("skew") / "events.parquet")
    df = (
        spark.range(N_TOTAL)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.col("id") % 100) + 1)
            .alias("user_id"),
            # ragged inter-event spacing so gaps straddle the session
            # boundary: step pattern 1s,7s,300s,2000s,... per row
            F.timestamp_seconds(
                F.lit(1_709_280_000)
                + (F.col("id") % 7) * 13
                + (F.col("id") / 4).cast("long") * 931
                + F.when(F.col("id") % 11 == 0, 2000).otherwise(0)
            ).alias("ts"),
            (F.col("id") % 97 / 10.0).alias("value"),
            # incompressible-ish payload so shuffle-partition BYTE sizes
            # reflect the row skew (shuffle stats are post-compression;
            # a constant payload would compress to nothing and AQE would
            # just coalesce)
            F.concat(
                F.sha2(F.col("id").cast("string"), 512),
                F.sha2((F.col("id") + 1).cast("string"), 512),
            ).alias("payload"),
        )
    )
    df.write.parquet(path)
    return path


def _con(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return con


def test_fixture_is_actually_skewed(spark, skewed_events):
    counts = (
        spark.read.parquet(skewed_events)
        .groupBy("user_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()
    )
    assert counts[0]["user_id"] == 0 and counts[0]["count"] == N_TOTAL // 2


def test_sessionize_correct_under_hot_key(spark, skewed_events):
    """q24's operator on the skewed fixture vs DuckDB's sequential
    window evaluation — the hot user's 10k-event partition must produce
    exactly the reference sessions."""
    ev = spark.read.parquet(skewed_events)
    got = sessionize(ev, gap_sec=GAP_SEC)
    sql = f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    d AS (SELECT user_id, us,
                 CASE WHEN us - lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > {GAP_SEC} * 1000000
                      THEN 1 ELSE 0 END AS new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (SELECT user_id, us,
                 CAST(sum(new) OVER w2 AS BIGINT) AS session_id
          FROM d WINDOW w2 AS (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING))
    SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
           min(us) AS session_start_us,
           max(us) - min(us) AS duration_us
    FROM s GROUP BY 1, 2
    """
    r = compare(got, _con(skewed_events), sql)
    assert r["ok"], r
    # sanity: the hot user actually has multi-session structure
    hot = got.filter(F.col("user_id") == 0)
    assert hot.count() > 1


def test_rolling_window_correct_under_hot_key(spark, skewed_events):
    """q66's RANGE-frame rolling aggregate under the same hot key —
    every one of the hot user's 10k rows carries the exact trailing-hour
    count/sum DuckDB computes sequentially."""
    e = spark.read.parquet(skewed_events).select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").cast("long").alias("sec"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    got = e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_value_hour"),
    )
    sql = """
    WITH e AS (SELECT event_id, user_id, value,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(sum(value) OVER w, 6) AS sum_value_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """
    r = compare(got, _con(skewed_events), sql)
    assert r["ok"], r


def test_aqe_splits_skewed_shuffle_join(spark, skewed_events):
    """The skew answer for JOINS: with broadcast off (both sides big in
    production), the hot user's shuffle partition must be split by AQE
    — `skew=true` on the executed SortMergeJoin — instead of one task
    dragging the stage."""
    ev = spark.read.parquet(skewed_events)
    dim = spark.range(101).select(
        F.col("id").alias("user_id"), (F.col("id") * 7).alias("attr")
    )
    conf = {
        # force a shuffle join and scale the skew thresholds down to the
        # fixture (defaults target multi-GB partitions)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # the payload must survive the join projection: shuffle-stage
        # byte sizes are what AQE's skew detector reads
        joined = ev.join(dim, "user_id").select(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("bytes"),
            F.sum("attr").alias("s"),
        )
        # correctness under the split: counts unchanged
        row = joined.collect()[0]
        assert row["n"] == N_TOTAL
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_ops_refuse_scratch_column_clash(spark):
    """A real _salt / _p_* column would be silently overwritten by the
    salting scratch (r8 review) — refused loudly on both operators."""
    import pytest

    from real_time_stream_processing_engine_spark.operators.skew import (
        salted_agg,
        salted_join,
    )

    d = spark.createDataFrame([(1, 2, 3)], "k long, v long, _salt long")
    with pytest.raises(ValueError, match="_salt"):
        salted_agg(d, ["k"], {"v": "sum"})
    p = spark.createDataFrame([(1, 2, 3)], "k long, v long, _p_v_sum long")
    with pytest.raises(ValueError, match="_p_"):
        salted_agg(p, ["k"], {"v": "sum"})
    ok = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(ok, d.select("k", "_salt"), "k")
