"""Round-6 wave 3: whitened-space retrieval and inverse-frequency
source flattening.  Literal-input semantics; q343/q344 pin each
against its DuckDB oracle on the shared tables."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators.sampling import (
    flattening_sample,
)
from real_time_stream_processing_engine_spark.operators.similarity import (
    whitened_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ---------------------------------------------------------------------------
# whitened_topk
# ---------------------------------------------------------------------------


def test_whitening_neutralizes_dominant_dimension(spark):
    # dim 0 swings 100x wider than dim 1: raw cosine would rank by dim
    # 0 alone; after per-dim standardization both dims carry equal
    # weight, so the neighbor agreeing in BOTH z-scores wins
    d = _emb(
        spark,
        [
            (1, [100.0, 1.0]),    # query: high dim0, high dim1
            (2, [100.0, -1.0]),   # high dim0, LOW dim1
            (3, [99.0, 1.0]),     # high dim0 (slightly less), high dim1
            (4, [-100.0, -1.0]),
            (5, [-99.0, -1.0]),
        ],
    )
    rows = whitened_topk(d, query_id=1, k=2).collect()
    assert rows[0].vec_id == 3
    assert rows[0].cos_sim > rows[1].cos_sim or rows[0].vec_id < rows[1].vec_id


def test_whitening_zero_variance_dim_is_dropped(spark):
    # dim 1 is constant: scale 0, so only dim 0 decides; no div-by-zero
    d = _emb(
        spark,
        [(1, [1.0, 7.0]), (2, [2.0, 7.0]), (3, [-3.0, 7.0])],
    )
    rows = whitened_topk(d, query_id=1, k=2).collect()
    assert [r.vec_id for r in rows] == [2, 3]
    assert all(r.cos_sim is not None for r in rows)


def test_whitened_excludes_query_and_bounds_k(spark):
    d = _emb(spark, [(1, [1.0, 2.0]), (2, [2.0, 1.0]), (3, [2.0, 2.0])])
    rows = whitened_topk(d, query_id=1, k=10).collect()
    assert {r.vec_id for r in rows} == {2, 3}


def test_whitened_mean_candidate_is_excluded(spark):
    # a candidate sitting exactly at the corpus mean whitens to the
    # zero vector: cosine undefined, row excluded (not an ANSI error)
    d = _emb(spark, [(1, [1.0, 2.0]), (2, [2.0, 1.0]), (3, [1.5, 1.5])])
    rows = whitened_topk(d, query_id=1, k=10).collect()
    assert {r.vec_id for r in rows} == {2}


def test_whitened_missing_query_raises(spark):
    d = _emb(spark, [(1, [1.0])])
    with pytest.raises(ValueError, match="query_id 9 not found"):
        whitened_topk(d, query_id=9)


# ---------------------------------------------------------------------------
# flattening_sample
# ---------------------------------------------------------------------------


def _docs(spark, groups):
    rows = []
    i = 0
    for g, n in groups.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def test_flattening_keeps_small_groups_whole(spark):
    d = _docs(spark, {"a": 5, "b": 3})
    out = flattening_sample(d, "src", "doc_id", target_per_group=10)
    assert out.count() == 8  # rate min(1, 10/n) = 1 for both


def test_flattening_downsamples_large_group_to_target(spark):
    d = _docs(spark, {"big": 2000, "small": 10})
    out = flattening_sample(d, "src", "doc_id", target_per_group=50).collect()
    n_big = sum(1 for r in out if r.src == "big")
    n_small = sum(1 for r in out if r.src == "small")
    assert n_small == 10
    # expected 50, Bernoulli sd ~7: a wide deterministic band
    assert 20 <= n_big <= 90


def test_flattening_deterministic_and_repartition_stable(spark):
    d = _docs(spark, {"a": 500})
    k1 = sorted(r.doc_id for r in flattening_sample(d, "src", "doc_id", 50).collect())
    k2 = sorted(
        r.doc_id
        for r in flattening_sample(d.repartition(7), "src", "doc_id", 50).collect()
    )
    assert k1 == k2


def test_flattening_drops_helper_column_and_rejects_bad_target(spark):
    d = _docs(spark, {"a": 4})
    out = flattening_sample(d, "src", "doc_id", 2)
    assert out.columns == ["doc_id", "src"]
    with pytest.raises(ValueError, match="target_per_group"):
        flattening_sample(d, "src", "doc_id", 0)


# ---------------------------------------------------------------------------
# copresence_pairs
# ---------------------------------------------------------------------------

import datetime

from real_time_stream_processing_engine_spark.operators.graph import (
    copresence_pairs,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, k, datetime.datetime(2024, 1, 1, h)) for u, k, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_copresence_counts_distinct_shared_cells(spark):
    ev = _events(
        spark,
        [
            (1, "view", 0), (2, "view", 0),    # shared cell 1
            (1, "view", 1), (2, "view", 1),    # shared cell 2
            (1, "view", 1), (2, "view", 1),    # duplicates collapse
            (1, "buy", 2), (3, "buy", 2),      # 1-3 share one cell
            (2, "buy", 3),                     # alone
        ],
    )
    rows = {(r.user_a, r.user_b): r for r in copresence_pairs(ev).collect()}
    assert rows[(1, 2)].co_cells == 2
    assert rows[(1, 3)].co_cells == 1
    # user 1 has 3 kept cells, user 2 has 3: overlap = 2/3
    assert rows[(1, 2)].overlap_ppm == 2 * 1_000_000 // 3


def test_copresence_hot_cell_excluded_by_cap(spark):
    # one cell holds 3 users > cap 2: contributes no pairs AND no
    # per-user cell counts; the quiet cell still pairs 1-2
    ev = _events(
        spark,
        [(1, "view", 0), (2, "view", 0), (3, "view", 0),
         (1, "view", 1), (2, "view", 1)],
    )
    rows = copresence_pairs(ev, max_users=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_a, r.user_b, r.co_cells) == (1, 2, 1)
    assert r.overlap_ppm == 1_000_000  # 1 shared of min(1, 1) kept cells


def test_copresence_different_kind_same_hour_is_not_shared(spark):
    ev = _events(spark, [(1, "view", 0), (2, "buy", 0)])
    assert copresence_pairs(ev).count() == 0


def test_copresence_null_user_and_ts_dropped_and_bad_cap_rejected(spark):
    import pytest as _pytest

    ev = spark.createDataFrame(
        [(None, "view", datetime.datetime(2024, 1, 1)),
         (1, "view", None),
         (1, "view", datetime.datetime(2024, 1, 1)),
         (2, "view", datetime.datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp",
    )
    rows = copresence_pairs(ev).collect()
    assert [(r.user_a, r.user_b) for r in rows] == [(1, 2)]
    with _pytest.raises(ValueError, match="max_users"):
        copresence_pairs(ev, max_users=1)
