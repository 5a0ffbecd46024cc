"""Round-6 wave 2: RRF rank fusion, hard-negative mining, exact-k
group reservoir, budget-capped curation, Adamic-Adar link prediction.
Literal-input semantics here; q338-q342 pin each against its DuckDB
oracle on the shared tables."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.graph import (
    adamic_adar_links,
)
from real_time_stream_processing_engine_spark.operators.sampling import (
    budget_capped_select,
    group_uniform_sample,
)
from real_time_stream_processing_engine_spark.operators.similarity import (
    dot_product_topk,
    hard_negative_topk,
    rrf_fuse,
)


# ---------------------------------------------------------------------------
# rrf_fuse / dot_product_topk
# ---------------------------------------------------------------------------


def _run(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, rank long")


def test_rrf_sums_integer_ppm_contributions(spark):
    a = _run(spark, [(10, 1), (11, 2)])
    b = _run(spark, [(11, 1), (12, 2)])
    out = {
        r.vec_id: (r.rrf_ppm, r.rank_a, r.rank_b)
        for r in rrf_fuse({"a": a, "b": b}, k0=60).collect()
    }
    c = lambda rank: 1_000_000 // (60 + rank)
    assert out == {
        10: (c(1), 1, None),
        11: (c(2) + c(1), 2, 1),
        12: (c(2), None, 2),
    }


def test_rrf_single_run_passthrough_and_empty_rejected(spark):
    a = _run(spark, [(1, 1)])
    assert rrf_fuse({"a": a}).collect()[0].rrf_ppm == 1_000_000 // 61
    with pytest.raises(ValueError, match="at least one run"):
        rrf_fuse({})


def test_dot_product_topk_ranks_by_magnitude(spark):
    # unit-direction vectors: cosine ties them all; dot ranks by norm
    d = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [2.0, 0.0]), (4, [0.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    got = [(r.vec_id, r.dot_score) for r in dot_product_topk(d, [1.0, 0.0], k=3).collect()]
    assert got == [(2, 3.0), (3, 2.0), (1, 1.0)]


# ---------------------------------------------------------------------------
# hard_negative_topk
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_hard_negative_picks_cross_label_argmax(spark):
    d = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.14], 1),   # near anchor, other label -> the hard negative
            (2, [1.0, 0.01], 0),    # nearer, same label -> excluded
            (3, [0.0, 1.0], 1),     # other label, orthogonal
        ],
    )
    rows = hard_negative_topk(d, anchor_ids=[0]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.anchor_id, r.anchor_label, r.neg_id, r.neg_label) == (0, 0, 1, 1)
    assert r.cos_sim == pytest.approx(0.99 / math.hypot(0.99, 0.14), abs=1e-6)


def test_hard_negative_tie_breaks_to_lowest_id(spark):
    d = _emb(
        spark,
        [(0, [1.0, 0.0], 0), (5, [2.0, 0.0], 1), (4, [3.0, 0.0], 1)],
    )
    r = hard_negative_topk(d, anchor_ids=[0]).collect()[0]
    # both negatives have cosine 1.0; the lower id wins
    assert r.neg_id == 4


def test_hard_negative_anchor_never_its_own_negative(spark):
    # the anchor shares its own label, so the label filter excludes it
    d = _emb(spark, [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0)])
    assert hard_negative_topk(d, anchor_ids=[0]).count() == 0


def test_hard_negative_rejects_empty_anchor_list(spark):
    d = _emb(spark, [(0, [1.0], 0)])
    with pytest.raises(ValueError, match="at least one anchor"):
        hard_negative_topk(d, anchor_ids=[])


# ---------------------------------------------------------------------------
# group_uniform_sample
# ---------------------------------------------------------------------------


def test_group_sample_exact_k_per_group(spark):
    d = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(50)], "grp string, id long"
    )
    out = group_uniform_sample(d, ["grp"], "id", k=5).collect()
    assert len(out) == 10
    for g in ("a", "b"):
        ranks = sorted(r.sample_rank for r in out if r.grp == g)
        assert ranks == [1, 2, 3, 4, 5]


def test_group_sample_small_group_passes_whole(spark):
    d = spark.createDataFrame([("a", 1), ("a", 2)], "grp string, id long")
    assert group_uniform_sample(d, ["grp"], "id", k=5).count() == 2


def test_group_sample_growth_stable(spark):
    # adding rows only displaces members whose draw the newcomer
    # undercuts: the k=3 member set of the base corpus stays a
    # superset-filtered subset under growth
    base = spark.createDataFrame([("a", i) for i in range(40)], "grp string, id long")
    grown = spark.createDataFrame(
        [("a", i) for i in range(80)], "grp string, id long"
    )
    s_base = {r.id for r in group_uniform_sample(base, ["grp"], "id", k=3).collect()}
    s_grown = {r.id for r in group_uniform_sample(grown, ["grp"], "id", k=3).collect()}
    # every grown-sample member drawn from the base id range must be a
    # base-sample member (prefix property of the hex-draw order)
    assert {i for i in s_grown if i < 40} <= s_base


def test_group_sample_rejects_nonpositive_k(spark):
    d = spark.createDataFrame([("a", 1)], "grp string, id long")
    with pytest.raises(ValueError, match="k must be positive"):
        group_uniform_sample(d, ["grp"], "id", k=0)


# ---------------------------------------------------------------------------
# budget_capped_select
# ---------------------------------------------------------------------------


def test_budget_prefix_cut_is_strict(spark):
    # scores order ids 1..4; costs 10,10,10,10 with budget 25 keep the
    # first two only (the third's inclusive cum 30 > 25 ends the walk)
    d = spark.createDataFrame(
        [(1, 4.0, 10), (2, 3.0, 10), (3, 2.0, 10), (4, 1.0, 10)],
        "id long, score double, cost long",
    )
    out = budget_capped_select(d, "score", "cost", "id", budget=25).collect()
    assert sorted((r.id, r.cum_cost) for r in out) == [(1, 10), (2, 20)]


def test_budget_excludes_null_and_nonpositive_costs(spark):
    d = spark.createDataFrame(
        [(1, 5.0, None), (2, 4.0, 0), (3, 3.0, 7)],
        "id long, score double, cost long",
    )
    out = budget_capped_select(d, "score", "cost", "id", budget=100).collect()
    assert [(r.id, r.cum_cost) for r in out] == [(3, 7)]


def test_budget_tie_breaks_by_id(spark):
    d = spark.createDataFrame(
        [(2, 1.0, 5), (1, 1.0, 5), (3, 1.0, 5)], "id long, score double, cost long"
    )
    out = budget_capped_select(d, "score", "cost", "id", budget=10).collect()
    assert sorted(r.id for r in out) == [1, 2]


def test_budget_rejects_nonpositive_budget(spark):
    d = spark.createDataFrame([(1, 1.0, 1)], "id long, score double, cost long")
    with pytest.raises(ValueError, match="budget must be positive"):
        budget_capped_select(d, "score", "cost", "id", budget=0)


# ---------------------------------------------------------------------------
# adamic_adar_links
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_adamic_adar_scores_open_wedge(spark):
    # path 1-2-3: candidate (1,3) via center 2 (deg 2)
    rows = adamic_adar_links(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.u, r.v, r.common_neighbors) == (1, 3, 1)
    assert r.aa_score == pytest.approx(1.0 / math.log(2.0), abs=1e-6)


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle: every wedge closes into an existing edge -> no output
    assert adamic_adar_links(_edges(spark, [(1, 2), (2, 3), (1, 3)])).count() == 0


def test_adamic_adar_sums_over_common_neighbors(spark):
    # 1 and 4 share centers 2 (deg 2) and 3 (deg 3, extra spoke 5)
    e = [(1, 2), (2, 4), (1, 3), (3, 4), (3, 5)]
    rows = {(r.u, r.v): r for r in adamic_adar_links(_edges(spark, e)).collect()}
    r = rows[(1, 4)]
    assert r.common_neighbors == 2
    assert r.aa_score == pytest.approx(
        1.0 / math.log(2.0) + 1.0 / math.log(3.0), abs=1e-6
    )


def test_adamic_adar_degree_cap_drops_hub_centers(spark):
    # star center 0 has degree 5 > cap 4: no wedges survive
    e = [(0, i) for i in range(1, 6)]
    assert adamic_adar_links(_edges(spark, e), deg_cap=4).count() == 0
    # raising the cap admits the hub: C(5,2) candidate pairs appear
    assert adamic_adar_links(_edges(spark, e), deg_cap=8).count() == 10


def test_adamic_adar_rejects_bad_cap(spark):
    with pytest.raises(ValueError, match="deg_cap"):
        adamic_adar_links(_edges(spark, [(1, 2)]), deg_cap=1)


def test_hard_negative_zero_norm_vectors_excluded_not_an_error(spark):
    # a zero embedding has no cosine: excluded on both sides instead of
    # raising DIVIDE_BY_ZERO under ANSI mode (r6 review catch)
    d = _emb(
        spark,
        [(0, [1.0, 0.0], 0), (1, [0.0, 0.0], 1), (2, [1.0, 1.0], 1),
         (3, [0.0, 0.0], 0)],
    )
    rows = hard_negative_topk(d, anchor_ids=[0, 3]).collect()
    # anchor 3 is zero-norm: no row for it; anchor 0 skips candidate 1
    assert [(r.anchor_id, r.neg_id) for r in rows] == [(0, 2)]
