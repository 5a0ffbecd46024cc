"""Scale smoke: the scalable formulations versus naive references at
millions of rows — evidence the decompositions hold beyond toy sizes,
not just on the sf0.001 fixtures.  All data is generated distributed
(spark.range); nothing is collected beyond small results."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
)
from real_time_stream_processing_engine_spark.operators.windows import (
    interval_concurrency,
)


def test_sweepline_matches_naive_at_2m_intervals(spark):
    """2M pseudo-random intervals: the two-phase distributed sweep
    equals the naive single-partition global running sum."""
    iv = spark.range(2_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3_000_000)).alias("s"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5000)) + 1).alias("len"),
    ).select("s", (F.col("s") + F.col("len") - 1).alias("e"))
    got = {
        r.bucket_start: r.max_concurrent
        for r in interval_concurrency(iv, "s", "e", bucket_sec=3600).collect()
    }
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").alias("nd"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    run = net.select(
        "t",
        F.sum("nd").over(w).alias("conc"),
        (F.sum("nd").over(w) - F.col("nd")).alias("prev_conc"),
        (F.floor(F.col("t") / 3600) * 3600).alias("bucket"),
    )
    naive = {
        r.bucket: r.mx
        for r in run.groupBy("bucket")
        .agg(
            F.max("conc").alias("mxc"),
            F.min("t").alias("first_t"),
            F.min_by("prev_conc", "t").alias("carry"),
        )
        .select(
            "bucket",
            F.when(
                F.col("first_t") > F.col("bucket"),
                F.greatest("mxc", "carry"),
            )
            .otherwise(F.col("mxc"))
            .alias("mx"),
        )
        .collect()
    }
    assert got == naive


def test_bitmap_distinct_matches_count_distinct_at_10m(spark):
    """10M events over a 500k id space, 30 'days': bitmap popcounts
    equal COUNT DISTINCT exactly."""
    ev = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(30)).alias("day"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(500_000)).alias("uid"),
    )
    words = (
        ev.select(
            "day",
            F.expr("uid div 64").alias("w"),
            F.expr("shiftleft(1L, cast(uid % 64 AS INT))").alias("bit"),
        )
        .groupBy("day", "w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    got = {
        r.day: r.dau
        for r in words.groupBy("day")
        .agg(F.sum(F.bit_count("bits")).alias("dau"))
        .collect()
    }
    want = {
        r.day: r.dau
        for r in ev.groupBy("day")
        .agg(F.count_distinct("uid").alias("dau"))
        .collect()
    }
    assert got == want


def test_bloom_prunes_10m_probe_without_false_negatives(spark):
    """10M-row probe against a 50k-key Bloom image: every true member
    survives (checked exactly via anti-join) and the false-positive
    mass stays near the analytic rate."""
    keys = spark.range(50_000).select((F.col("id") * 13 + 5).alias("k"))
    bitmap = bloom_build(keys, "k", num_bits=1 << 20)
    probe = spark.range(10_000_000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(probe, "k", bitmap, num_bits=1 << 20)
    # no false negatives: true members missing from kept == 0
    true_in_probe = keys.filter(F.col("k") < 10_000_000)
    missing = true_in_probe.join(kept, "k", "left_anti").count()
    assert missing == 0
    # pruning: kept ~= 50k members + fpp * 10M (fpp ~ (1-e^{-3n/m})^3)
    n_kept = kept.count()
    assert n_kept < 50_000 + 0.01 * 10_000_000
