"""Connected-components semantics on literal graphs (q56 pins the
LSH-pair pipeline against the recursive-CTE oracle)."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators.graph import (
    connected_components,
)


def _clusters(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.cluster_id, set()).add(r.node)
    return {min(v): v for v in out.values()}


def test_chain_collapses_transitively(spark):
    # A~B, B~C, C~D: one component although A~C, A~D never emitted
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = _clusters(connected_components(edges))
    assert got == {1: {1, 2, 3, 4}, 10: {10, 11}}


def test_cluster_id_is_min_member(spark):
    edges = spark.createDataFrame([(7, 3), (3, 9), (20, 15)], "doc_a long, doc_b long")
    rows = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert rows == {3: 3, 7: 3, 9: 3, 15: 15, 20: 15}


def test_long_chain_converges_within_diameter(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    rows = {r.node: r.cluster_id for r in connected_components(edges, max_iter=n + 1).collect()}
    assert set(rows.values()) == {0}


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2)


# ---------------------------------------------------------------------------
# large-star/small-star formulation: same answer, logarithmic rounds
# ---------------------------------------------------------------------------


def test_star_equals_propagation_on_random_graphs(spark):
    import random

    from real_time_stream_processing_engine_spark.operators.graph import (
        connected_components_star,
    )

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        edges = spark.createDataFrame(
            [(rng.randrange(40), rng.randrange(40)) for _ in range(60)],
            "doc_a long, doc_b long",
        ).filter("doc_a <> doc_b")
        a = {r.node: r.cluster_id for r in connected_components(edges).collect()}
        b = {r.node: r.cluster_id for r in connected_components_star(edges).collect()}
        assert a == b, f"seed {seed}"


def test_star_converges_logarithmically_on_deep_chain(spark):
    """A 64-node chain has diameter 63: min-propagation needs ~63
    rounds; the star formulation must finish in O(log n)."""
    from real_time_stream_processing_engine_spark.operators.graph import (
        connected_components_star,
    )

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    rows = {r.node: r.cluster_id for r in connected_components_star(edges, max_iter=14).collect()}
    assert rows == {i: 0 for i in range(n)}
    assert connected_components_star.rounds <= 12


def test_star_two_node_and_preclustered(spark):
    from real_time_stream_processing_engine_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 9), (1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    rows = {r.node: r.cluster_id for r in connected_components_star(edges).collect()}
    assert rows == {5: 5, 9: 5, 1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# fixpoint HA: reliable checkpoints + kill/restart resume (r3-verdict item)
# ---------------------------------------------------------------------------


def _chain(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


def test_reliable_checkpoint_same_answer(spark, tmp_path):
    """checkpoint_dir: every K-th lineage cut goes to reliable storage;
    the answer is unchanged and checkpoint files actually land."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = _chain(spark, 12)
    plain = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    ha = {
        r.node: r.cluster_id
        for r in connected_components(
            edges, checkpoint_dir=ckpt, checkpoint_every=2, max_iter=15
        ).collect()
    }
    assert ha == plain
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no reliable checkpoint files written"


def test_propagation_kill_restart_resumes_and_matches(spark, tmp_path):
    """Driver crash mid-fixpoint (injected after the first state save),
    restart with the same state_dir: the loop must RESUME from the
    saved labels — fewer rounds than a clean run — and the labels must
    equal the uninterrupted answer exactly."""
    state = str(tmp_path / "cc_state")
    edges = _chain(spark, 14)
    clean = {
        r.node: r.cluster_id
        for r in connected_components(edges, max_iter=20).collect()
    }
    clean_rounds = connected_components.rounds
    with pytest.raises(RuntimeError, match="injected driver crash"):
        connected_components(
            edges, max_iter=20, state_dir=state, save_every=2, _fail_after_saves=2
        )
    got = {
        r.node: r.cluster_id
        for r in connected_components(
            edges, max_iter=20, state_dir=state, save_every=2
        ).collect()
    }
    assert connected_components.resumed is True
    assert connected_components.rounds < clean_rounds
    assert got == clean
    # completed run cleared its state: a fresh call does NOT resume
    connected_components(edges, max_iter=20, state_dir=state)
    assert connected_components.resumed is False


def test_star_kill_restart_resumes_and_matches(spark, tmp_path):
    from real_time_stream_processing_engine_spark.operators.graph import (
        connected_components_star,
    )

    state = str(tmp_path / "star_state")
    edges = _chain(spark, 64)
    clean = {
        r.node: r.cluster_id
        for r in connected_components_star(edges, max_iter=30).collect()
    }
    clean_rounds = connected_components_star.rounds
    with pytest.raises(RuntimeError, match="injected driver crash"):
        connected_components_star(
            edges, max_iter=30, state_dir=state, save_every=1, _fail_after_saves=3
        )
    got = {
        r.node: r.cluster_id
        for r in connected_components_star(
            edges, max_iter=30, state_dir=state, save_every=1
        ).collect()
    }
    assert connected_components_star.resumed is True
    assert connected_components_star.rounds < clean_rounds
    assert got == clean


def test_pagerank_uniform_on_cycle(spark):
    """On a directed cycle every node keeps exactly 1/N at every
    round — the closed-form fixed point."""
    from real_time_stream_processing_engine_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src: string, dst: string"
    )
    out = {r["node"]: r["pr"] for r in pagerank(e, iters=3).collect()}
    for v in out.values():
        assert abs(v - 1.0 / 3.0) < 1e-12


def test_pagerank_star_center_dominates(spark):
    """Symmetrized star: the hub must out-rank every leaf, and one
    round of hand-arithmetic pins the exact values: each leaf sends its
    whole 0.2 (out-degree 1) to the hub, the hub splits its 0.2 four
    ways — hub = 0.15/5 + 0.85*(4*0.2), leaf = 0.15/5 + 0.85*(0.2/4)."""
    from real_time_stream_processing_engine_spark.operators.graph import pagerank

    spokes = [("hub", f"l{i}") for i in range(4)]
    e0 = spokes + [(b, a) for a, b in spokes]
    e = spark.createDataFrame(e0, "src: string, dst: string")
    out = {r["node"]: r["pr"] for r in pagerank(e, iters=1).collect()}
    assert abs(out["hub"] - (0.03 + 0.85 * 0.8)) < 1e-12
    for i in range(4):
        assert abs(out[f"l{i}"] - (0.03 + 0.85 * 0.2 / 4)) < 1e-12
    assert out["hub"] > max(out[f"l{i}"] for i in range(4))


def test_pagerank_conserves_mass_on_closed_graph(spark, sf_dir):
    """With every node having out-degree >= 1 (symmetrized edges), the
    total rank mass stays 1 after any number of rounds."""
    from pyspark.sql import functions as F

    from real_time_stream_processing_engine_spark.operators.graph import pagerank
    from real_time_stream_processing_engine_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    e = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    total = pagerank(e, iters=2).agg(F.sum("pr")).head()[0]
    assert abs(total - 1.0) < 1e-9


def test_cc_variants_agree_on_self_loops_and_kcore_checkpoints(spark, tmp_path):
    """r5 review: (a) a node whose only edge is a self-loop must emit
    (node, node) from BOTH CC variants (the star form dropped it);
    (b) kcore(checkpoint_dir=...) must actually set the checkpoint dir
    (it crashed in a fresh session)."""
    from real_time_stream_processing_engine_spark.operators.graph import (
        connected_components,
        connected_components_star,
        kcore,
    )

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    plain = {
        (r.node, r.cluster_id) for r in connected_components(edges).collect()
    }
    star = {
        (r.node, r.cluster_id)
        for r in connected_components_star(edges).collect()
    }
    assert plain == star == {(5, 5), (1, 1), (2, 1), (3, 1)}
    # kcore with a reliable checkpoint dir in this session
    e2 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    got = {
        r.v
        for r in kcore(
            e2, k=2, rounds=3, checkpoint_dir=str(tmp_path / "kc"), checkpoint_every=1
        ).collect()
    }
    assert got == {1, 2, 3}  # the triangle survives, the pendant drops
