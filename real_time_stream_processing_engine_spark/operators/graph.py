"""Iterative graph operators: connected components for dedup clustering.

Pairwise near-dup output (LSH/SimHash/Jaccard pairs) is not yet a dedup
decision: A~B and B~C must collapse into ONE cluster even when A~C was
never emitted.  That is connected components over the pair graph — the
one genuinely ITERATIVE algorithm in the training-data pipeline, so it
exercises the pattern Spark needs for any fixpoint computation:

- a driver loop over DataFrame joins (the data never collects);
- ``localCheckpoint()`` each iteration to truncate lineage — without it
  the plan doubles per iteration and analysis time explodes;
- a cheap distributed convergence check (count of changed labels).

Min-label propagation converges in O(graph diameter) iterations; near-
dup components are shallow (dozens of docs, diameter a few hops), so
3-5 iterations is typical.  At extreme scale the alternating
large-star/small-star formulation halves rounds; the loop shape below
is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; ``cluster_id`` is
    the minimum node id reachable in the undirected pair graph —
    deterministic, so two runs (and a SQL oracle's recursive closure)
    agree exactly.

    Each iteration: every node adopts the min of its own label and its
    neighbors' labels (one join + one partial-aggregated groupBy), then
    a count of changed labels decides convergence.  Raises if the graph
    hasn't converged after ``max_iter`` rounds (diameter > max_iter
    means something is wrong with the pair generator, not the loop)."""
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    sym = sym.localCheckpoint()
    # seed with round 1 fused in: label = min(self, direct neighbors) —
    # one aggregate instead of a full loop iteration (join + agg + count)
    labels = (
        sym.groupBy("s")
        .agg(F.min("d").alias("_m"))
        .select(F.col("s").alias("node"), F.least("s", "_m").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_min"))
        )
        # the changed flag rides the update itself (a label changes iff
        # a neighbor's min beats it), so convergence costs one narrow
        # count over the checkpointed frame — not a second join job.
        # LAZY checkpoint: the convergence count below is the job that
        # materializes it, so each round runs ONE job, not two.
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["s"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_min") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(component diameter exceeds max_iter)"
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: link every LARGER neighbor to the minimum of
    u's closed neighborhood.  Tall chains collapse toward the minimum
    from above."""
    s = _sym(e)
    m = s.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        s.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: link u and all SMALLER neighbors to their
    collective minimum.  Flat fans re-center on the minimum."""
    lt = _sym(e).filter(F.col("v") < F.col("u"))
    m = lt.groupBy("u").agg(F.min("v").alias("m"))
    linked = lt.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    centers = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        linked.unionByName(centers)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same (node, cluster_id=component minimum) contract as
    :func:`connected_components`, different convergence behavior:
    O(log diameter) rounds instead of O(diameter), because each
    large-star halves the height of tall chains while min-label
    propagation walks them one hop per round.

    For shallow near-dup clusters the simple propagation wins on
    constant factors (fewer jobs per round); THIS is the extreme-scale
    form for when components can be deep (link graphs, co-occurrence
    graphs).  Both are exposed; `tests/test_graph.py` pins their
    equality and the logarithmic round count on a pathological chain."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    for it in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        fp = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        fp = (fp["n"], int(fp["h"]))
        if fp == prev_fp:
            connected_components_star.rounds = it + 1
            # fixed point: edges are stars (leaf -> center); centers
            # label themselves
            leaves = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
            centers = e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id"))
            return leaves.unionByName(centers).distinct()
        prev_fp = fp
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} iterations"
    )
