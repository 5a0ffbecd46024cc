"""Round-9 structured-review fixes, second batch — the 08-14/08-15
operator files (clustering/rangejoin/packing/bpe/skew): malformed-vector
masking in k-means and the remaining silent column-collision /
bad-token-count classes.  Every test fails on the prior code."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import PySparkException


# ---------------------------------------------------------------------------
# assign_clusters / kmeans_lloyd: malformed vectors masked, never cluster 0
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_clusters_masks_malformed_vectors(spark):
    from real_time_stream_processing_engine_spark.operators.clustering import (
        assign_clusters,
    )

    df = _emb(
        spark,
        [
            (1, [0.0, 0.0]),      # clean -> cluster 0
            (2, [10.0, 10.0]),    # clean -> cluster 1
            (3, None),            # NULL vector
            (4, [1.0, None]),     # NULL element
            (5, [1.0]),           # length mismatch vs 2-dim centroids
        ],
    )
    got = {
        r.vec_id: (r.cluster, r.sq_dist)
        for r in assign_clusters(
            df, [[0.0, 0.0], [10.0, 10.0]], keep_dist=True
        ).collect()
    }
    assert got[1] == (0, 0.0)
    assert got[2] == (1, 0.0)
    # each malformed shape used to tie-break its all-NULL distance
    # structs straight into cluster 0
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_kmeans_lloyd_ignores_malformed_vectors(spark):
    from real_time_stream_processing_engine_spark.operators.clustering import (
        kmeans_lloyd,
    )

    clean_rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 1.0]),
        (3, [10.0, 10.0]),
        (4, [11.0, 11.0]),
    ]
    clean = kmeans_lloyd(_emb(spark, clean_rows), k=2, iters=2)
    dirty = kmeans_lloyd(
        _emb(spark, [(0, None), (90, [5.0, None]), (99, [7.0])] + clean_rows),
        k=2,
        iters=2,
    )
    want = {(r.cluster, r.dim): (r.centroid_v, r.n_members) for r in clean.collect()}
    got = {(r.cluster, r.dim): (r.centroid_v, r.n_members) for r in dirty.collect()}
    # vec_id 0 sorts FIRST: a NULL seed used to TypeError at float();
    # the malformed rows also used to count into cluster 0's members
    assert got == want
    assert want[(0, 1)][1] == 2  # and the clean counts are the real ones


def test_kmeans_lloyd_all_malformed_refused(spark):
    from real_time_stream_processing_engine_spark.operators.clustering import (
        kmeans_lloyd,
    )

    with pytest.raises(ValueError, match="well-formed"):
        kmeans_lloyd(_emb(spark, [(1, None), (2, [1.0, None])]), k=2)


# ---------------------------------------------------------------------------
# binned_range_join: a real `_bin` column is refused, not clobbered
# ---------------------------------------------------------------------------


def test_range_join_refuses_bin_collision(spark):
    from real_time_stream_processing_engine_spark.operators.rangejoin import (
        binned_range_join,
    )

    plain = spark.createDataFrame(
        [(1,)], "k long"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1000)))
    withbin = plain.withColumn("_bin", F.lit(7))
    for left, right in ((withbin, plain), (plain, withbin)):
        with pytest.raises(ValueError, match="_bin"):
            binned_range_join(left, right, "ts", "ts", 0, 60)


# ---------------------------------------------------------------------------
# pack_sequences: out-name collision refused; NULL/negative counts loud
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, shard long"
    )


def test_pack_sequences_refuses_out_collision(spark):
    from real_time_stream_processing_engine_spark.operators.packing import (
        pack_sequences,
    )

    df = _docs(spark, [(1, 5, 0)])
    with pytest.raises(ValueError, match="n_tokens"):
        pack_sequences(
            df, budget=10, token_col="n_tokens", order_col="doc_id",
            group_cols=["shard"], out="n_tokens",
        )


@pytest.mark.parametrize("bad", [None, -3])
def test_pack_sequences_refuses_bad_token_counts(spark, bad):
    from real_time_stream_processing_engine_spark.operators.packing import (
        pack_sequences,
    )

    df = _docs(spark, [(1, 5, 0), (2, bad, 0), (3, 5, 0)])
    out = pack_sequences(
        df, budget=8, token_col="n_tokens", order_col="doc_id",
        group_cols=["shard"],
    )
    # NULL used to yield a silent NULL pack_id; a negative count made
    # the running sum dip so doc 3 rejoined doc 1's closed pack
    with pytest.raises(PySparkException, match="non-negative token count"):
        out.collect()


# ---------------------------------------------------------------------------
# bpe_encode_words: encoding a frame already carrying syms/n_tokens
# ---------------------------------------------------------------------------


def test_bpe_encode_refuses_syms_collision(spark):
    from real_time_stream_processing_engine_spark.operators.bpe import (
        bpe_learn,
        bpe_encode_words,
    )

    words = spark.createDataFrame([("aab", 3)], "word string, w long")
    merges, final_vocab = bpe_learn(words, n_merges=1)
    # the documented train-then-apply composition, fed the WRONG frame:
    # final_vocab already carries the learned `syms`, which encode used
    # to overwrite silently
    with pytest.raises(ValueError, match="syms"):
        bpe_encode_words(final_vocab, merges)


# ---------------------------------------------------------------------------
# salted_agg: output names colliding with keys or each other
# ---------------------------------------------------------------------------


def test_salted_agg_refuses_output_name_collisions(spark):
    from real_time_stream_processing_engine_spark.operators.skew import salted_agg

    df = spark.createDataFrame([("a", 1, 2)], "sum_v string, v long, x long")
    with pytest.raises(ValueError, match="sum_v"):
        salted_agg(df, keys=["sum_v"], aggs={"v": "sum"})
    with pytest.raises(ValueError, match="sum_x"):
        salted_agg(df, keys=["v"], aggs={"x": ["sum", "sum"]})


# ---------------------------------------------------------------------------
# dedup fingerprint/shingles: caller columns refused, not clobbered
# ---------------------------------------------------------------------------


def test_fingerprint_and_shingles_refuse_collisions(spark):
    from real_time_stream_processing_engine_spark.operators.dedup import (
        fingerprint,
        shingles,
    )

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="fingerprint"):
        fingerprint(docs.withColumn("fingerprint", F.lit("precomputed")))
    with pytest.raises(ValueError, match="_toks"):
        shingles(docs.withColumn("_toks", F.lit(1)))
    with pytest.raises(ValueError, match="shingle"):
        shingles(docs.withColumn("shingle", F.lit("mine")))
