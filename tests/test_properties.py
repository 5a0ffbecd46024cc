"""Property-based tests (hypothesis) for the invariants the oracle
can't see: parser round-trips over arbitrary patterns, tokenization /
fingerprint contracts over arbitrary text, and salted aggregation
equivalence over arbitrary groupings.

These run the Python-side logic through the same JVM expressions the
operators use, on tiny literal frames — cheap per example, so each
property gets a few dozen generated cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.functions.textfn import (
    normalize_ws,
    tokenize,
)
from real_time_stream_processing_engine_spark.operators.parser import (
    parse_operation_string,
)

# text without the quote char (quotes change lexing, covered separately)
plain_word = st.text(
    alphabet=st.characters(blacklist_characters='"', blacklist_categories=("Cs", "Zs", "Cc")),
    min_size=1,
    max_size=12,
)
SET = dict(
    deadline=None,
    max_examples=40,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(words=st.lists(plain_word, min_size=1, max_size=8))
@settings(**SET)
def test_lexer_roundtrips_unquoted_words(words):
    assert parse_operation_string(" ".join(words)) == words


@given(words=st.lists(plain_word, min_size=1, max_size=5))
@settings(**SET)
def test_lexer_quoted_token_keeps_spaces(words):
    token = '"' + " ".join(words) + '"'
    out = parse_operation_string(f"RAINSTORM {token} f.txt 2")
    assert out == ["RAINSTORM", token, "f.txt", "2"]


# ASCII only: JVM and Python disagree on lowercase mappings for exotic
# scripts (different Unicode table versions) and on what counts as
# whitespace (Python str.split splits on \x1c-\x1f etc., Java \s does
# not) — platform artifacts, not engine behavior.  The contract being
# pinned (split semantics, empty removal, lowercasing) lives in ASCII.
texts = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E) | st.sampled_from(" \t\n\r"),
    max_size=80,
)


@given(data=st.lists(texts, min_size=1, max_size=8))
@settings(**SET)
def test_tokenize_matches_python_reference(spark, data):
    """The JVM tokenization contract == the documented Python model:
    lowercased whitespace split, empties removed."""
    df = spark.createDataFrame([(t,) for t in data], "text string")
    got = [r.toks for r in df.select(tokenize("text").alias("toks")).collect()]
    want = [t.lower().split() for t in data]
    assert got == want


@given(t=texts, pad=st.sampled_from([" ", "  ", "\t", "\n", " \t "]))
@settings(**SET)
def test_fingerprint_invariant_under_whitespace(spark, t, pad):
    """Exact-dedup fingerprints must not see whitespace layout: padding
    and internal whitespace runs normalize away."""
    variants = [t, f"{pad}{t}{pad}", t.replace(" ", pad) if " " in t else t]
    df = spark.createDataFrame([(v,) for v in variants], "text string")
    fps = {r.fp for r in df.select(F.md5(normalize_ws("text")).alias("fp")).collect()}
    assert len(fps) == 1


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from("abc"),
            st.integers(-1000, 1000) | st.none(),
            st.integers(-1000, 1000) | st.none(),
        ),
        min_size=1,
        max_size=30,
    ),
    n_salt=st.sampled_from([2, 5, 16]),
)
@settings(**SET)
def test_salted_agg_equals_plain_agg_property(spark, rows, n_salt):
    """Two-phase salted aggregation is a drop-in for the plain one on
    arbitrary (nullable) data and any salt width."""
    from real_time_stream_processing_engine_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, v int, w int")
    salted = {
        r.k: (r.sum_v, r.count_w, r.max_v if hasattr(r, "max_v") else None)
        for r in salted_agg(df, ["k"], {"v": "sum", "w": "count"}, n_salt=n_salt).collect()
    }
    plain = {
        r.k: (r.sum_v, r.count_w, None)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count("w").alias("count_w"))
        .collect()
    }
    assert salted == plain
