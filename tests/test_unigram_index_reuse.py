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
