"""k-core peeling semantics (q203 pins the co-purchase 2-core against
the unrolled-peel SQL oracle; these pin the operator on literal graphs
and the fixed-round contract on the fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.graph import kcore


def _core(df):
    return {r.v: r.core_degree for r in df.collect()}


def test_tail_is_peeled_triangle_survives(spark):
    # triangle 1-2-3 plus a pendant path 3-4-5: the path unravels in
    # two rounds (5 first, then 4), the triangle stays at degree 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert _core(kcore(edges, k=2, rounds=4)) == {1: 2, 2: 2, 3: 2}


def test_single_round_is_not_a_fixpoint(spark):
    # after ONE round only 5 is gone; 4 still present with degree 1 —
    # the iterative part is what earns the name
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert _core(kcore(edges, k=2, rounds=1)) == {1: 2, 2: 2, 3: 3, 4: 1}


def test_k3_peels_everything_without_k4_clique(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert _core(kcore(edges, k=3, rounds=3)) == {}


def test_k3_keeps_k4_clique(spark):
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        clique + [(4, 9), (9, 10)], "src long, dst long"
    )
    assert _core(kcore(edges, k=3, rounds=3)) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_q203_rounds_reach_fixpoint_on_fixture(spark, sf_dir):
    """The declared 6 rounds sit past convergence at test SF: one more
    round changes nothing (the no-op-after-convergence contract the
    oracle relies on)."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
        .select("x", "y")
    )
    six = _core(kcore(edges, k=2, rounds=6, src_col="x", dst_col="y"))
    seven = _core(kcore(edges, k=2, rounds=7, src_col="x", dst_col="y"))
    assert six == seven
    assert six, "fixture 2-core should not be empty"
