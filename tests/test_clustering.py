"""Lloyd's k-means: known-answer recovery, SSE monotonicity, and the
bounded-driver-traffic loop contract (oracle hashing is q98's job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.clustering import (
    assign_clusters,
    kmeans_lloyd,
)
from real_time_stream_processing_engine_spark.sources.readers import load_table


def _toy(spark):
    """Three tight, well-separated 2-d groups; lowest-id seeds land one
    per group, so 2 rounds must recover the group means exactly."""
    pts = (
        [(i, [0.0 + 0.1 * i, 0.0]) for i in range(3)]
        + [(10 + i, [10.0 + 0.1 * i, 10.0]) for i in range(3)]
        + [(20 + i, [-10.0 + 0.1 * i, 5.0]) for i in range(3)]
    )
    return spark.createDataFrame(pts, "vec_id: long, embedding: array<double>")


def test_kmeans_recovers_separated_groups(spark):
    df = _toy(spark)
    # seeds = ids 0,1,2 — ALL in group one; Lloyd must still split the
    # three groups apart within two rounds (the far groups capture the
    # nearer seeds at the first update)
    out = kmeans_lloyd(df, k=3, iters=2, vec_col="embedding").collect()
    counts = {r["cluster"]: r["n_members"] for r in out}
    assert sorted(counts.values()) == [3, 3, 3]
    got = {
        (r["cluster"], r["dim"]): r["centroid_v"]
        for r in out
    }
    # each cluster's dim-1 centroid is a group mean (x.1 mean = x+0.1)
    xs = sorted(got[(c, 1)] for c in counts)
    assert xs == [-9.9, 0.1, 10.1]


def test_assignment_dist_is_zero_for_seed_vectors(spark):
    df = _toy(spark)
    seeds = [[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]]
    a = assign_clusters(df, seeds, keep_dist=True)
    zeros = a.filter(F.col("sq_dist") == 0.0).count()
    assert zeros == 3  # each group's i=0 point sits exactly on a seed
    own = assign_clusters(
        spark.createDataFrame(
            [(0, seeds[1])], "vec_id: long, embedding: array<double>"
        ),
        seeds,
        keep_dist=True,
    ).head()
    assert own["cluster"] == 1 and own["sq_dist"] == 0.0


def test_kmeans_sse_non_increasing(spark, sf_dir):
    """Lloyd's invariant: total within-cluster SSE cannot increase
    from the seed assignment to the post-update assignment."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").orderBy("vec_id").limit(4).collect()
    ]
    a1 = assign_clusters(emb, seeds, keep_dist=True)
    sse1 = a1.agg(F.sum("sq_dist")).head()[0]
    rows = (
        a1.select("cluster", F.posexplode("embedding").alias("dim0", "x"))
        .groupBy("cluster", "dim0")
        .agg(F.avg(F.col("x").cast("double")).alias("v"))
        .collect()
    )
    dims = len(seeds[0])
    mat: dict[int, list[float]] = {}
    for r in rows:
        mat.setdefault(int(r["cluster"]), [0.0] * dims)[int(r["dim0"])] = float(r["v"])
    cents = [mat.get(i, seeds[i]) for i in range(4)]
    a2 = assign_clusters(emb, cents, keep_dist=True)
    sse2 = a2.agg(F.sum("sq_dist")).head()[0]
    assert sse2 <= sse1


def test_kmeans_stable_under_repartition(spark, sf_dir):
    """Layout-independence: the same answer from a repartitioned input
    (the argmin and the averages are both partitioning-agnostic)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_lloyd(emb, k=4, iters=2).collect()))
    b = sorted(
        map(tuple, kmeans_lloyd(emb.repartition(13), k=4, iters=2).collect())
    )
    assert a == b


def test_jl_projection_preserves_distances_roughly(spark, sf_dir):
    """JL sanity on real vectors: for sampled pairs, the projected/
    original distance ratio stays within a loose band for most pairs
    (16 dims is aggressive; the bound here is the smoke guarantee the
    ANN-over-projection path rests on, not the epsilon theorem)."""
    import math

    from real_time_stream_processing_engine_spark.queries import QUERIES
    from real_time_stream_processing_engine_spark.sources.readers import load_table

    rows = QUERIES["q110_jl_projection"](spark, sf_dir).collect()
    proj = {}
    for r in rows:
        proj.setdefault(r["vec_id"], [0.0] * 16)[r["dim"] - 1] = r["v"]
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 40)
        .collect()
    }
    ids = sorted(emb)
    ok = tot = 0
    for a, b in zip(ids[:-1], ids[1:]):
        d0 = math.dist(emb[a], emb[b])
        d1 = math.dist(proj[a], proj[b])
        tot += 1
        if d0 > 0 and 0.3 <= d1 / d0 <= 2.0:
            ok += 1
    assert tot >= 30 and ok / tot >= 0.8, (ok, tot)
