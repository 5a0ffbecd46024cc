"""Scale-path tools: bucketed co-located joins and skew salting.

These are the two explicit 100 TB techniques that aren't visible in any
single query plan: bucketing trades one write-time shuffle for zero
join-time exchanges forever after; salting spreads a hot key over many
tasks.  Each test checks both the RESULT (equal to the naive plan) and
the PLAN property that makes it scale.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.skew import salted_agg, salted_join
from real_time_stream_processing_engine_spark.sources.catalog import create_bucketed
from real_time_stream_processing_engine_spark.sources.readers import load_table


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"^\s*\(\d+\) Exchange\b", plan, re.M))


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    create_bucketed(cust, "b_customer", 8, "c_custkey")
    create_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "b_orders", 8, "c_custkey"
    )
    yield "b_customer", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    tc, to = bucketed_tables
    cust, orders = spark.table(tc), spark.table(to)
    # disable broadcast so the join must pick a shuffle-free strategy
    joined = cust.hint("merge").join(orders, "c_custkey")
    plan = _fmt(joined)
    assert _exchanges(plan) == 0, plan  # co-located: no shuffle at all


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    tc, to = bucketed_tables
    bucketed_n = spark.table(tc).hint("merge").join(spark.table(to), "c_custkey").count()
    plain_n = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "orders").withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            "c_custkey",
        )
        .count()
    )
    assert bucketed_n == plain_n


def test_bucketed_aggregate_has_no_exchange(spark, bucketed_tables):
    _, to = bucketed_tables
    agg = spark.table(to).groupBy("c_custkey").agg(F.count("*").alias("n"))
    assert _exchanges(_fmt(agg)) == 0  # grouping key == bucket key


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_agg(
        ev, ["event_type"], {"value": "sum", "event_id": "count", "user_id": "max"}
    )
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"),
        F.count("event_id").alias("count_event_id"),
        F.max("user_id").alias("max_user_id"),
    )
    s = {tuple(r) for r in salted.withColumn("sum_value", F.round("sum_value", 6)).collect()}
    p = {tuple(r) for r in plain.withColumn("sum_value", F.round("sum_value", 6)).collect()}
    assert s == p


def test_salted_agg_count_excludes_nulls(spark):
    """count(col) semantics: nulls in the named column don't count —
    drop-in parity with the unsalted groupBy().agg(F.count(col))."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], "k string, v int"
    )
    got = {r.k: r.count_v for r in salted_agg(df, ["k"], {"v": "count"}).collect()}
    assert got == {"a": 2, "b": 0}


def test_salted_agg_rejects_non_reaggregable(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"value": "avg"})


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "k")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
    )
    salted = salted_join(ev, dim, "k", n_salt=4)
    plain = ev.join(dim, "k")
    assert salted.count() == plain.count()
    s = salted.groupBy("c_mktsegment").count().collect()
    p = plain.groupBy("c_mktsegment").count().collect()
    assert {tuple(r) for r in s} == {tuple(r) for r in p}


def test_salted_join_spreads_hot_key(spark):
    # one mega-key: every big row has k=1; salting must spread it over
    # n_salt distinct (k, salt) groups
    big = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("payload"))
    small = spark.range(1).select(F.lit(1).alias("k"), F.lit("x").alias("attr"))
    out = salted_join(big, small, "k", n_salt=8)
    assert out.count() == 1000
    n_groups = (
        big.withColumn(
            "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(8)).cast("int")
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_groups > 1  # the hot key no longer lands on a single task


def test_salted_join_rejects_outer_joins(spark, sf_dir):
    # right/full outer would duplicate unmatched small-side rows per
    # replica — must be rejected, left/inner accepted
    ev = load_table(spark, sf_dir, "events").limit(10).withColumnRenamed("user_id", "k")
    dim = load_table(spark, sf_dir, "customer").limit(10).select(
        F.col("c_custkey").alias("k")
    )
    with pytest.raises(ValueError):
        salted_join(ev, dim, "k", how="full_outer")
    with pytest.raises(ValueError):
        salted_join(ev, dim, "k", how="right")
    assert salted_join(ev, dim, "k", how="left_outer").count() == 10


def test_salt_spreads_byte_identical_duplicate_rows(spark):
    """r5 review: a content-hash salt concentrated a hot key made of
    identical rows into ONE salt bucket, silently defeating the
    mitigation.  The positional salt must spread them."""
    from real_time_stream_processing_engine_spark.operators.skew import (
        _spread_salt,
        salted_agg,
    )

    dup = spark.createDataFrame([("hot", 1.0)] * 2000, "k string, v double").repartition(8)
    n_buckets = dup.select(_spread_salt(16).alias("s")).distinct().count()
    assert n_buckets > 4  # identical rows land in many salt buckets
    # and the multi-fn aggs spell an avg decomposition in one call
    got = salted_agg(dup, ["k"], {"v": ["sum", "count"]}).collect()[0]
    assert (got.sum_v, got.count_v) == (2000.0, 2000)


def test_zorder_and_kmeans_reject_empty_input(spark, tmp_path):
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.clustering import (
        kmeans_lloyd,
    )
    from real_time_stream_processing_engine_spark.operators.layout import (
        build_zordered,
    )

    empty = spark.createDataFrame([], "id long, a double, b double")
    with _pytest.raises(ValueError, match="z-order"):
        build_zordered(empty, str(tmp_path / "z"), "a", "b")
    eempty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty input"):
        kmeans_lloyd(eempty, k=4)


def test_range_join_rejects_numeric_epoch_columns(spark):
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.rangejoin import (
        binned_range_join,
    )

    l = spark.createDataFrame([(1, 1000)], "id long, ts long")
    r = spark.createDataFrame([(2, 2000)], "id long, ts long")
    with _pytest.raises(ValueError, match="timestamp"):
        binned_range_join(l, r, "ts", "ts", lower_s=0, upper_s=3600)


def test_bpe_encode_accepts_learned_triples(spark):
    """r5 review: bpe_learn returns (l, r, count) triples; the encoder
    must consume them directly."""
    from real_time_stream_processing_engine_spark.operators.bpe import (
        bpe_encode_words,
        bpe_learn,
    )

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6)], "word string, w long"
    )
    merges, _ = bpe_learn(words, n_merges=3)
    out = bpe_encode_words(words, merges)
    assert out.filter(F.col("n_tokens") <= 0).count() == 0
