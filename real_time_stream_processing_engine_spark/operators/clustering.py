"""Distributed Lloyd's k-means over an embedding column.

The iterative-ML shape on DataFrames: each round is ONE distributed
pass (assign every vector to its nearest centroid, recompute the
per-cluster element-wise means) with the centroids themselves riding
driver-side between rounds — k x dims floats, the bounded-broadcast
pattern every parameter-server-free implementation uses (same posture
as the IVF codebook seeds, ``queries.py`` q28/q77).

Scale anatomy per round:
- the assignment is k squared-distance expressions built from
  ``aggregate``/``zip_with`` over broadcast centroid literals — pure
  whole-stage codegen, no Python, no shuffle;
- the update is a posexplode + ONE partial-aggregated exchange on
  (cluster, dim) carrying k x dims combined partials (q94's centroid
  shape), never vectors;
- the only driver traffic is the k x dims centroid matrix per round.

Determinism (the oracle contract): seeds are the k lowest-id vectors;
assignment tie-breaks by (rounded distance, cluster id), with the
distance rounded to 6 dp BEFORE the argmin so cross-engine float-sum
ordering cannot flip a near-tie.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import lit_double_array


def _sq_dist(vec_col: Column, centroid: list[float]) -> Column:
    """Squared euclidean distance to a broadcast centroid literal —
    codegen-only (aggregate over zip_with), JVM-side."""
    lit = lit_double_array(centroid)
    diffs = F.zip_with(
        vec_col, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    keep_dist: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment: argmin over k distance expressions
    via ``array_min`` on (rounded distance, cluster) structs — struct
    ordering IS the deterministic tie-break.  ``keep_dist`` adds the
    winning squared distance (convergence monitoring / SSE).

    A vector with no defined distance — NULL vector, NULL element, or a
    length mismatch against the centroids (``zip_with`` pads the short
    side with NULLs, so every centroid distance goes NULL together) —
    is MASKED to a NULL cluster rather than silently argmin'd: all-NULL
    distance structs would tie-break purely on cluster id and dump
    every malformed vector into cluster 0, inflating its member count
    while contributing nothing to its centroid (same bogus-match class
    as ``asof_join_nearest``'s NULL-timestamp mask)."""
    pick = F.array_min(
        F.array(
            *[
                F.struct(
                    F.round(_sq_dist(F.col(vec_col), c), 6).alias("d"),
                    F.lit(i).cast("long").alias("c"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    defined = pick.getField("d").isNotNull()
    out = emb.withColumn("cluster", F.when(defined, pick.getField("c")))
    if keep_dist:
        out = out.withColumn("sq_dist", F.when(defined, pick.getField("d")))
    return out


def _centroid_rows(assigned: DataFrame, vec_col: str) -> DataFrame:
    """(cluster, dim, v): per-cluster element-wise mean — q94's one
    partial-aggregated exchange, dims are 1-based to match SQL arrays."""
    # masked rows (NULL cluster) are excluded: a wrong-length vector
    # still posexplodes real elements, which would otherwise average
    # into a phantom cluster-NULL centroid and TypeError the driver's
    # int(cluster) readback
    pos = assigned.filter(F.col("cluster").isNotNull()).select(
        "cluster", F.posexplode(vec_col).alias("dim0", "x")
    )
    return pos.groupBy(
        "cluster", (F.col("dim0") + 1).cast("long").alias("dim")
    ).agg(F.avg(F.col("x").cast("double")).alias("v"))


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return the flat centroid table
    (cluster, dim, centroid_v, n_members) for the FINAL update,
    counts from the final assignment.

    The loop's only driver round-trip is the k x dims centroid matrix
    (bounded, independent of data size); the final round's update is
    returned as a DataFrame, not collected."""
    # seeds come from WELL-FORMED vectors only: a NULL vector or NULL
    # element among the k lowest ids would TypeError at float() below,
    # and a malformed seed would define the dims every other vector is
    # measured against (malformed DATA rows are masked per-row in
    # assign_clusters instead)
    well_formed = F.col(vec_col).isNotNull() & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    seed_rows = (
        emb.filter(well_formed)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[1]] for r in seed_rows]
    if not centroids:
        raise ValueError(
            "kmeans_lloyd: no well-formed vectors to seed centroids from "
            "(empty input, or every row's vector is NULL / has NULL "
            "elements)"
        )
    # fewer rows than k seeds fewer clusters — labels stay 0..n_seeds-1
    # (documented degrade; an empty frame is the only hard error)
    dims = len(centroids[0])
    assigned = assign_clusters(emb, centroids, vec_col)
    for _ in range(iters - 1):
        # bounded k x dims driver read between rounds
        rows = _centroid_rows(assigned, vec_col).collect()
        mat: dict[int, list[float]] = {}
        for r in rows:
            mat.setdefault(int(r["cluster"]), [0.0] * dims)[
                int(r["dim"]) - 1
            ] = float(r["v"])
        # a cluster that lost all members keeps its previous centroid
        centroids = [
            mat.get(i, centroids[i]) for i in range(len(centroids))
        ]
        assigned = assign_clusters(emb, centroids, vec_col)
    cent = _centroid_rows(assigned, vec_col).select(
        "cluster", "dim", F.round("v", 6).alias("centroid_v")
    )
    counts = assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members")
    )
    return cent.join(counts, "cluster").select(
        "cluster", "dim", "centroid_v", "n_members"
    )
