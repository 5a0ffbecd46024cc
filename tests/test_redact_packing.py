"""Redaction (q60 family) and sequence packing (q61) semantics.

The oracle pins q60/q61 end-to-end; these tests pin what the synthetic
corpus can't exercise — the standard PII patterns on text that actually
contains PII, the sequential no-double-count contract, word-boundary
blocklisting, and the packing invariants (packs can't close early,
can't stay open past the budget).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.packing import pack_sequences
from real_time_stream_processing_engine_spark.operators.text import (
    PII_PATTERNS,
    blocklist_pattern,
    regex_redact,
)


def test_pii_patterns_count_and_mask(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com or c.d+x@e.org, call 555-123-4567, host 10.0.0.1"),
            (2, "clean text with no pii at all"),
            (3, "just 192.168.254.3 twice: 192.168.254.3"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in regex_redact(df, PII_PATTERNS).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (2, 1, 1)
    assert rows[1]["redacted"] == "mail [EMAIL] or [EMAIL], call [PHONE], host [IPV4]"
    assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (0, 0, 0)
    assert rows[2]["redacted"] == rows[2]["text"]
    assert rows[3]["n_ipv4"] == 2


def test_redaction_is_sequential_no_double_count(spark):
    # Both patterns match "a@b.com"; the second must see the already-
    # masked text, so it counts 0 and the mask is the FIRST label's.
    df = spark.createDataFrame([(1, "write a@b.com now")], ["doc_id", "text"])
    pats = {"email": PII_PATTERNS["email"], "word": r"\b[a-z]+@[a-z.]+\b"}
    row = regex_redact(df, pats).collect()[0]
    assert (row["n_email"], row["n_word"]) == (1, 0)
    assert row["redacted"] == "write [EMAIL] now"


def test_blocklist_is_whole_word(spark):
    df = spark.createDataFrame([(1, "hash hashing rehash hash")], ["doc_id", "text"])
    row = regex_redact(df, {"blocked": blocklist_pattern(["hash"])}).collect()[0]
    assert row["n_blocked"] == 2
    assert row["redacted"] == "[BLOCKED] hashing rehash [BLOCKED]"


def test_blocklist_requires_terms():
    with pytest.raises(ValueError):
        blocklist_pattern([])


def test_blocklist_escapes_metacharacters(spark):
    # "c++" must compile and match literally; "a.b" must not widen to
    # "a<any>b".
    df = spark.createDataFrame([(1, "c++ and a.b but not aXb")], ["doc_id", "text"])
    row = regex_redact(df, {"blocked": blocklist_pattern(["c++", "a.b"])}).collect()[0]
    assert row["n_blocked"] == 2
    assert row["redacted"] == "[BLOCKED] and [BLOCKED] but not aXb"


def test_redact_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, "x", 0)], ["doc_id", "text", "n_email"])
    with pytest.raises(ValueError, match="n_email"):
        regex_redact(df, PII_PATTERNS)
    df2 = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="text"):
        regex_redact(df2, PII_PATTERNS, out="text")


@pytest.fixture()
def packed(spark):
    # One group, budget 10: docs of 4,4,4 tokens -> pre_cum 0,4,8 all in
    # pack 0 (closes at 12 >= 10); then 9 -> pack 1; then 25 straddles
    # several budgets alone; then 1.
    rows = [(i, "g", n) for i, n in enumerate([4, 4, 4, 9, 25, 1])]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tokens"])
    out = pack_sequences(
        df, budget=10, token_col="n_tokens", order_col="doc_id", group_cols=["grp"]
    )
    return {r["doc_id"]: r["pack_id"] for r in out.collect()}


def test_packing_assignment(packed):
    assert packed == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 4}


def test_packing_invariants(spark):
    # Property check on a bigger ragged input: within each group,
    # (a) packs are contiguous in order, (b) a pack minus its final doc
    # is under budget (never closes early), (c) every non-final pack
    # reaches its boundary (never stays open past the budget).
    budget = 50
    rows = [(i, f"g{i % 3}", 1 + (i * 7919) % 37) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tokens"])
    out = pack_sequences(
        df, budget=budget, token_col="n_tokens", order_col="doc_id", group_cols=["grp"]
    ).collect()
    by_grp: dict[str, list] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_grp.setdefault(r["grp"], []).append(r)
    for rs in by_grp.values():
        assert [r["pack_id"] for r in rs] == sorted(r["pack_id"] for r in rs)  # contiguous
        cum = 0
        last_pack = rs[-1]["pack_id"]
        packs: dict[int, list] = {}
        for r in rs:
            assert r["pack_id"] == cum // budget  # the defining equation
            cum += r["n_tokens"]
            packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
        for pid, toks in packs.items():
            assert sum(toks[:-1]) < budget  # never closes early
        # total through every non-final pack crossed that pack's boundary
        run = 0
        for pid in sorted(packs):
            run += sum(packs[pid])
            if pid != last_pack:
                assert run >= (pid + 1) * budget


def test_packing_rejects_unbounded_window(spark):
    df = spark.createDataFrame([(1, 5)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=10, token_col="n_tokens", order_col="doc_id", group_cols=[])


# ---------------------------------------------------------------------------
# chunk_tokens (q71): coverage / overlap / boundary invariants
# ---------------------------------------------------------------------------


def test_chunking_covers_all_tokens_with_overlap(spark):
    from real_time_stream_processing_engine_spark.operators.text import chunk_tokens

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))),  # 100 toks -> 3 chunks
         (2, "only two"),                              # 1 short chunk
         (3, "")],                                     # no chunks
        "doc_id: long, text: string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], list(r["chunk_toks"]))
        for r in chunk_tokens(docs, chunk=64, stride=48).collect()
    )
    by_doc = {}
    for d, c, t in rows:
        by_doc.setdefault(d, []).append((c, t))
    assert 3 not in by_doc  # zero-token doc emits nothing
    assert [c for c, _ in by_doc[2]] == [0] and by_doc[2][0][1] == ["only", "two"]
    chunks1 = by_doc[1]
    # 100 tokens, chunk 64, stride 48: [0,64) + [48,100) cover fully;
    # a third window [96,100) would be a strict subset of chunk 1 and
    # must NOT be emitted (the r5 duplicate-suffix fix)
    assert [c for c, _ in chunks1] == [0, 1]
    assert [len(t) for _, t in chunks1] == [64, 52]  # last chunk truncates
    # stride placement: chunk i starts at token i*48
    for i, toks in chunks1:
        assert toks[0] == f"w{i * 48}"
    # consecutive full chunks overlap by chunk - stride = 16 tokens
    assert chunks1[0][1][-16:] == chunks1[1][1][:16]
    # every token appears in some chunk
    seen = {t for _, toks in chunks1 for t in toks}
    assert seen == {f"w{i}" for i in range(100)}


def test_chunking_rejects_bad_stride(spark):
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.text import chunk_tokens

    docs = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    with _pytest.raises(ValueError):
        chunk_tokens(docs, chunk=8, stride=9)
    with _pytest.raises(ValueError):
        chunk_tokens(docs, chunk=8, stride=0)


def test_blocklist_rejects_empty_terms(spark):
    """r5 review: an empty term compiles to an every-position match
    that would label-inject between every character."""
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.text import (
        blocklist_pattern,
    )

    with _pytest.raises(ValueError, match="non-empty"):
        blocklist_pattern(["secret", ""])
    with _pytest.raises(ValueError, match="non-empty"):
        blocklist_pattern(["  "])
