"""Round-6 operator wave: edit-distance blocked near-dup, triangle
census, tf-idf cosine pairs, systematic PPS sampling, shingle
containment.  Literal-input semantics here; q333-q337 pin each against
its DuckDB oracle on the shared tables."""

from __future__ import annotations

import itertools

import pytest

from real_time_stream_processing_engine_spark.operators.dedup import (
    containment_pairs,
    edit_distance_pairs,
)
from real_time_stream_processing_engine_spark.operators.graph import triangle_stats
from real_time_stream_processing_engine_spark.operators.sampling import (
    systematic_weighted_sample,
)
from real_time_stream_processing_engine_spark.operators.text import (
    tfidf_cosine_pairs,
)


# ---------------------------------------------------------------------------
# edit_distance_pairs
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_edit_distance_finds_typo_pair_once(spark):
    d = _docs(
        spark,
        [
            (1, "en", "the quick brown fox jumps over the lazy dog"),
            (2, "en", "the quick brown fox jumps over the lazy dgo"),  # swap
            (3, "en", "completely different text about spark engines"),
        ],
    )
    rows = edit_distance_pairs(d).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in rows] == [(1, 2, 2)]


def test_edit_distance_normalizes_whitespace_and_case(spark):
    d = _docs(spark, [(1, "en", "Hello   World"), (2, "en", "hello world")])
    rows = edit_distance_pairs(d).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in rows] == [(1, 2, 0)]


def test_edit_distance_blocks_cross_lang_and_null(spark):
    d = _docs(
        spark,
        [(1, "en", "same text here"), (2, "fr", "same text here"), (3, "en", None)],
    )
    assert edit_distance_pairs(d).count() == 0


def test_edit_distance_straddling_buckets_matched_once(spark):
    # lengths 15 and 17 straddle the width-16 bucket boundary; the
    # higher-bucket rule must yield exactly one pair row
    d = _docs(spark, [(1, "en", "a" * 15), (2, "en", "a" * 17)])
    rows = edit_distance_pairs(d).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in rows] == [(1, 2, 2)]


def test_edit_distance_length_gap_prunes(spark):
    # gap 13 > max_dist 12: no candidate even within one bucket hop
    d = _docs(spark, [(1, "en", "a" * 30), (2, "en", "a" * 43)])
    assert edit_distance_pairs(d).count() == 0


def test_edit_distance_rejects_bucket_width_at_most_max_dist(spark):
    d = _docs(spark, [(1, "en", "x")])
    with pytest.raises(ValueError, match="bucket_width"):
        edit_distance_pairs(d, bucket_width=12, max_dist=12)


# ---------------------------------------------------------------------------
# triangle_stats
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_triangle_stats_single_triangle(spark):
    r = triangle_stats(_edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 3, 3, 1)
    assert r.clustering_ppm == 1_000_000


def test_triangle_stats_path_has_no_triangle(spark):
    r = triangle_stats(_edges(spark, [(1, 2), (2, 3)])).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 2, 1, 0)
    assert r.clustering_ppm == 0


def test_triangle_stats_empty_graph_null_clustering(spark):
    r = triangle_stats(_edges(spark, [(1, 2)])).collect()[0]
    assert (r.n_wedges, r.n_triangles) == (0, 0)
    assert r.clustering_ppm is None


def test_triangle_stats_dedupes_direction_and_self_loops(spark):
    # duplicate edges, reversed duplicates and self loops collapse
    r = triangle_stats(
        _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)])
    ).collect()[0]
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_stats_matches_bruteforce_on_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(18))
    es = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)})
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in es or (b, a) in es)
        and ((b, c) in es or (c, b) in es)
        and ((a, c) in es or (c, a) in es)
    )
    r = triangle_stats(_edges(spark, es)).collect()[0]
    assert r.n_triangles == expected


def test_triangle_stats_skew_star_counts_zero(spark):
    # celebrity hub: many wedges, no triangles; the oriented plan puts
    # the hub LAST in degree order so its out-degree stays tiny
    r = triangle_stats(_edges(spark, [(0, i) for i in range(1, 30)])).collect()[0]
    assert (r.n_wedges, r.n_triangles) == (29 * 28 // 2, 0)


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs
# ---------------------------------------------------------------------------


def test_tfidf_identical_docs_score_one(spark):
    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in tfidf_cosine_pairs(d, max_df=10, min_sim=0.0).collect()
    }
    assert rows == {(1, 2): 1.0}


def test_tfidf_df_cap_drops_ubiquitous_terms(spark):
    # 'common' appears in every doc; with max_df=2 only rare terms pair
    d = spark.createDataFrame(
        [(1, "common apple"), (2, "common apple"), (3, "common pear")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b)
        for r in tfidf_cosine_pairs(d, max_df=2, min_sim=0.0).collect()
    }
    assert rows == {(1, 2)}


def test_tfidf_orthogonal_docs_absent(spark):
    d = spark.createDataFrame(
        [(1, "only unique words here"), (2, "entirely disjoint vocabulary set")],
        "doc_id long, text string",
    )
    assert tfidf_cosine_pairs(d, max_df=10, min_sim=0.0).count() == 0


# ---------------------------------------------------------------------------
# systematic_weighted_sample
# ---------------------------------------------------------------------------


def test_pps_exact_k_and_strata(spark):
    d = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, w long"
    )
    out = systematic_weighted_sample(d, "w", ["doc_id"], k=10).collect()
    assert len(out) == 10
    assert [r.stratum for r in sorted(out, key=lambda r: r.doc_id)] == list(
        range(1, 11)
    )


def test_pps_heavy_row_always_included_once(spark):
    # one row carries >half the total weight: spans many strata, must
    # appear exactly once; output stays <= k
    rows = [(1, 1000)] + [(i, 1) for i in range(2, 52)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    out = systematic_weighted_sample(d, "w", ["doc_id"], k=10)
    got = out.collect()
    assert sum(1 for r in got if r.doc_id == 1) == 1
    assert len(got) <= 10


def test_pps_skips_null_and_nonpositive_weights(spark):
    d = spark.createDataFrame(
        [(1, None), (2, 0), (3, -5), (4, 7), (5, 7)],
        "doc_id long, w long",
    )
    out = systematic_weighted_sample(d, "w", ["doc_id"], k=2).collect()
    assert {r.doc_id for r in out} == {4, 5}


def test_pps_rejects_nonpositive_k(spark):
    d = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with pytest.raises(ValueError, match="k must be positive"):
        systematic_weighted_sample(d, "w", ["doc_id"], k=0)


def test_pps_deterministic_under_repartition(spark):
    d = spark.createDataFrame(
        [(i, (i * 37) % 13 + 1) for i in range(200)], "doc_id long, w long"
    )
    a = sorted(
        r.doc_id
        for r in systematic_weighted_sample(d, "w", ["doc_id"], k=17).collect()
    )
    b = sorted(
        r.doc_id
        for r in systematic_weighted_sample(
            d.repartition(7), "w", ["doc_id"], k=17
        ).collect()
    )
    assert a == b and len(a) == 17


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_detects_embedded_subset(spark):
    short = "unique marker phrase xyzzy plugh"
    long_doc = "prefix padding words " + short + " suffix trailer content"
    d = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, "unrelated other stuff entirely")],
        "doc_id long, text string",
    )
    rows = containment_pairs(d, k=8, max_df=16, min_cont_ppm=800_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # every kept shingle of the short doc appears in the long one
    assert r.cont_a_ppm == 1_000_000
    assert r.cont_b_ppm < 800_000


def test_containment_df_cap_drops_boilerplate(spark):
    # the same 8-gram-rich boilerplate in ALL docs exceeds max_df=2 and
    # must not produce pairs
    boiler = "shared boilerplate header line"
    d = spark.createDataFrame(
        [(i, boiler) for i in range(1, 5)], "doc_id long, text string"
    )
    assert containment_pairs(d, k=8, max_df=2, min_cont_ppm=1).count() == 0


def test_containment_short_and_null_texts_excluded(spark):
    d = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "long enough text body"), (4, "long enough text body")],
        "doc_id long, text string",
    )
    rows = containment_pairs(d, k=8, max_df=16, min_cont_ppm=800_000).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(3, 4)]


def test_tfidf_all_common_terms_doc_is_excluded_not_an_error(spark):
    # doc 3's only term appears in every doc: idf 0 -> zero norm ->
    # cosine undefined; the doc drops out instead of raising
    # DIVIDE_BY_ZERO under ANSI mode (r6 review catch)
    d = spark.createDataFrame(
        [(1, "shared rare1"), (2, "shared rare1"), (3, "shared")],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(d, max_df=10, min_sim=0.0).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(1, 2)}


# ---------------------------------------------------------------------------
# randomized differentials: engine vs brute-force Python reference
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(t: str) -> str:
    return " ".join(t.lower().split())


def _noisy_corpus(seed: int, n: int):
    import random

    rng = random.Random(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    base = [" ".join(rng.choices(words, k=rng.randint(4, 30))) for _ in range(n // 3)]
    rows = []
    for i in range(n):
        src = rng.choice(base)
        # random character edits to plant near-dups at varied distances
        t = list(src)
        for _ in range(rng.randint(0, 18)):
            p = rng.randrange(len(t))
            op = rng.randint(0, 2)
            if op == 0:
                t[p] = rng.choice("abcdefghij ")
            elif op == 1 and len(t) > 5:
                del t[p]
            else:
                t.insert(p, rng.choice("abcdefghij"))
        rows.append((i, rng.choice(["en", "fr"]), "".join(t)))
    return rows


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_edit_distance_matches_bruteforce_reference(spark, seed):
    rows = _noisy_corpus(seed, 48)
    expected = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ia, la, ta = rows[i]
            ib, lb, tb = rows[j]
            if la != lb:
                continue
            na, nb = _norm(ta), _norm(tb)
            if abs(len(na) - len(nb)) > 12:
                continue
            d = _lev(na[:120], nb[:120])
            if d <= 12:
                a, b = sorted((ia, ib))
                expected.add((a, b, d))
    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in edit_distance_pairs(
            spark.createDataFrame(rows, "doc_id long, lang string, text string")
        ).collect()
    }
    assert got == expected and expected  # non-vacuous: seeds plant dups


@pytest.mark.parametrize("seed", [5, 31])
def test_containment_matches_bruteforce_reference(spark, seed):
    rows = _noisy_corpus(seed, 36)
    k, max_df, thr = 8, 16, 500_000
    sh = {
        i: {_norm(t)[p:p + k] for p in range(len(_norm(t)) - k + 1)}
        for i, _, t in rows
        if len(_norm(t)) >= k
    }
    df_count: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    kept = {i: {g for g in s if df_count[g] <= max_df} for i, s in sh.items()}
    expected = set()
    ids = sorted(kept)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(kept[a] & kept[b])
            if not inter or not kept[a] or not kept[b]:
                continue
            ca = inter * 1_000_000 // len(kept[a])
            cb = inter * 1_000_000 // len(kept[b])
            if max(ca, cb) >= thr:
                expected.add((a, b, inter, ca, cb))
    got = {
        (r.doc_a, r.doc_b, r.n_common, r.cont_a_ppm, r.cont_b_ppm)
        for r in containment_pairs(
            spark.createDataFrame(
                [(i, t) for i, _, t in rows], "doc_id long, text string"
            ),
            k=k,
            max_df=max_df,
            min_cont_ppm=thr,
        ).collect()
    }
    assert got == expected and expected
