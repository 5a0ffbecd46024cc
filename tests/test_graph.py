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
