"""Index-first LM scoring: one postings build serves every path.

Pins the r3-verdict posture promotion: the BM25 postings index is
built ONCE, and (a) q74 derives whole-corpus scores from it with zero
corpus re-reads, (b) ``unigram_logprob(freq_table=...)`` scores a
document batch against the index-derived corpus LM in O(batch), and
both agree exactly with (c) the self-contained q68 form — because the
index stores the same (doc, term, tf) facts the in-query tokenize
produces.
"""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators.text import (
    build_bm25_index,
    term_frequencies_from_postings,
    unigram_logprob,
)
from real_time_stream_processing_engine_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bm25_index(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path_factory.mktemp("postings") / "idx")
    build_bm25_index(docs, path)
    return docs, path


def _scores(df):
    return {
        r.doc_id: (r.n_tokens, r.avg_logprob)
        for r in df.select("doc_id", "n_tokens", "avg_logprob").collect()
    }


def test_freq_table_path_equals_self_contained(spark, bm25_index):
    docs, path = bm25_index
    self_contained = _scores(unigram_logprob(docs))
    via_index = _scores(
        unigram_logprob(
            docs, freq_table=term_frequencies_from_postings(spark, path)
        )
    )
    assert via_index == self_contained and len(via_index) > 0


def test_batch_scoring_probes_frozen_corpus_lm(spark, bm25_index):
    """The production loop: score a SUBSET batch against the corpus LM.
    Batch scores must equal the full-run scores for those docs — the
    distribution is the index's, not the batch's own."""
    docs, path = bm25_index
    full = _scores(unigram_logprob(docs))
    batch = docs.limit(50)
    freq = term_frequencies_from_postings(spark, path)
    got = _scores(unigram_logprob(batch, freq_table=freq))
    assert got and all(full[d] == v for d, v in got.items())
    # the self-scored batch would DISAGREE (its own distribution):
    # proves freq_table actually supplies the model
    self_scored = _scores(unigram_logprob(batch))
    assert self_scored != got


def test_q74_and_q68_share_scores(spark, sf_dir):
    from real_time_stream_processing_engine_spark.queries import QUERIES

    a = _scores(QUERIES["q68_unigram_logprob"](spark, sf_dir))
    b = _scores(QUERIES["q74_unigram_logprob_indexed"](spark, sf_dir))
    assert a == b and len(a) > 0


def test_bm25_duplicate_query_terms_dedup_in_both_paths(spark, tmp_path):
    """r5 review: repeated/case-duplicate query terms crashed the
    index-free path (duplicate literal map keys) — both paths now
    dedupe and must agree."""
    from real_time_stream_processing_engine_spark.operators.text import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [(1, "spark streams data fast"), (2, "data data everywhere"),
         (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    dup_q = ["Data", "data", "SPARK"]
    plain = [(r.doc_id, r.bm25) for r in bm25_topk(docs, dup_q, k=3).collect()]
    clean = [(r.doc_id, r.bm25) for r in bm25_topk(docs, ["data", "spark"], k=3).collect()]
    assert plain == clean and plain
    path = str(tmp_path / "bm25i")
    build_bm25_index(docs, path, n_shards=8)
    indexed = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, path, dup_q, k=3).collect()
    ]
    assert indexed == plain


def test_bm25_probe_self_describes_sharding(spark, tmp_path):
    """r5 review: a probe whose n_shards/seed args mismatch the build
    used to prune the WRONG partitions and return silently bad top-k;
    the index now carries its own params and the probe reads them."""
    from real_time_stream_processing_engine_spark.operators.text import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [(i, f"term{i % 5} shared filler w{i}") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bm25p")
    build_bm25_index(docs, path, n_shards=32, seed="other-seed")
    want = [(r.doc_id, r.bm25) for r in bm25_topk(docs, ["term3", "shared"], k=5).collect()]
    # probe with DIFFERENT (default) args: must still be right
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, path, ["term3", "shared"], k=5).collect()
    ]
    assert got == want and want


def test_unigram_oov_penalizes_instead_of_dropping(spark):
    """r5 review: scoring a new batch against a frozen LM used to DROP
    unknown tokens (garbage scored as clean).  With oov_ctf they score
    log(oov/N) and n_tokens counts every token."""
    import math

    from real_time_stream_processing_engine_spark.operators.text import (
        unigram_logprob,
    )

    corpus_freq = spark.createDataFrame(
        [("known", 90), ("words", 10)], "term string, ctf long"
    )
    batch = spark.createDataFrame(
        [(1, "known words"), (2, "known zzqx vvgr wwpp")],
        "doc_id long, text string",
    )
    # default (oracle-parity): OOV drops — doc 2 scores on 1 token
    legacy = {
        r.doc_id: (r.n_tokens, r.avg_logprob)
        for r in unigram_logprob(batch, corpus_freq).collect()
    }
    assert legacy[2][0] == 1
    got = {
        r.doc_id: (r.n_tokens, r.avg_logprob)
        for r in unigram_logprob(batch, corpus_freq, oov_ctf=0.5).collect()
    }
    assert got[1][0] == 2 and got[2][0] == 4
    want2 = (math.log(90 / 100) + 3 * math.log(0.5 / 100)) / 4
    assert abs(got[2][1] - want2) < 1e-5
    assert got[2][1] < legacy[2][1]  # garbage now scores WORSE, not better
