"""Bloom runtime filter: no false negatives ever, measured pruning on
disjoint keys, and a codegen-only probe (no shuffle, no Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    bitmap = bloom_build(keys, "k")
    probe = spark.range(0, 40000).select(F.col("id").alias("k"))
    kept = set(r.k for r in bloom_prefilter(probe, "k", bitmap).collect())
    true_keys = set(r.k for r in keys.collect()) & set(range(40000))
    assert true_keys <= kept  # every real member survives


def test_pruning_measured(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k")
    # disjoint probe range: everything kept is a false positive
    probe = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, "k", bitmap).count()
    # m=65536 bits, n=1000 keys, k=3 hashes -> fpp ~ (1-e^{-kn/m})^k ~ 8e-5
    assert fp < 0.01 * 100_000  # orders of magnitude pruning


def test_probe_is_codegen_only(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k")
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = bloom_prefilter(probe, "k", bitmap)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_prefilter_refuses_scratch_column_clash(spark):
    """A real `_bp_p0` column would be silently overwritten by the
    probe's scratch hash and then dropped (r8 review)."""
    import pytest

    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k")
    probe = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(1).alias("_bp_p0")
    )
    with pytest.raises(ValueError, match="_bp_p"):
        bloom_prefilter(probe, "k", bitmap)
