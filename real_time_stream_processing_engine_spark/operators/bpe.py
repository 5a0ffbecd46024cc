"""Byte-pair-encoding merge learning over a distributed corpus —
tokenizer preparation as DataFrame iterations.

BPE's training loop (Sennrich et al. 2016) is: count adjacent symbol
pairs across the (frequency-weighted) vocabulary, merge the most
frequent pair everywhere, repeat.  Each round here is two distributed
steps over the VOCAB-sized word table (never the corpus — word
frequencies are aggregated once up front, the classic optimization):

- pair counting: one scan-side ``transform`` building adjacent pairs +
  one partial-aggregated sum weighted by word frequency; the argmax
  pair is a 1-row driver read (bounded, like the k-means centroids);
- merge application: a codegen ``aggregate`` fold over each word's
  symbol array — greedy left-to-right exactly like the reference
  algorithm (a merged symbol cannot re-merge with the next char in the
  same pass), no Python, no shuffle.

Determinism: pair ties break by (count DESC, left, right).  The merge
TABLE is rows-only at the driver contract (the apply step's
sequential fold has no DuckDB equivalent — ``list_reduce`` cannot
carry a list accumulator); the classic worked example and the
reconstruction/length invariants are pinned in
``tests/test_bpe.py`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.lineage import lineage_cut


def char_symbols(word: Column) -> Column:
    """Initial symbol sequence: one char per symbol (split on the
    empty pattern leaves a trailing empty string — filtered)."""
    return F.filter(F.split(word, ""), lambda x: x != "")


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b, as a
    codegen fold: a freshly merged symbol is not re-considered as the
    left side within the same pass (run semantics match reference
    BPE: 'aaa' under (a,a) -> ['aa', 'a'])."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(x, y, cnt): adjacent-pair frequencies weighted by word count —
    scan-side transform + one partial-aggregated exchange."""
    pairs = vocab.select(
        "w",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS x, syms[i] AS y))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<x:string,y:string>>)"))
        ).alias("p"),
    )
    return pairs.groupBy("p.x", "p.y").agg(F.sum("w").alias("cnt"))


def bpe_learn(
    words: DataFrame,
    n_merges: int = 3,
    word_col: str = "word",
    weight_col: str = "w",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, frequency) table.

    Returns (merges, final_vocab): merges as [(left, right, count)] in
    learned order; final_vocab as (word, w, syms) with all merges
    applied.  Each round touches only the vocab table; the only driver
    traffic is ONE (pair, count) row per round."""
    vocab = words.select(
        F.col(word_col).alias("word"),
        F.col(weight_col).alias("w"),
        char_symbols(F.col(word_col)).alias("syms"),
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["x"], top[0]["y"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        # LAZY lineage cut per round (r12 optimization): without it the
        # fold chain accumulates — round k's pair-count job replays all
        # k-1 earlier folds (Σk = O(R²) fold passes over the vocab) and
        # the nested-lambda plan deepens every round, so analysis +
        # codegen time grows per round too (profiled at 15.5 s of
        # driver-side gaps over 8 rounds at sf0.1).  The cut caps every
        # round at ONE fold and a depth-1 plan; the next round's
        # argmax collect is the job that materializes it, keeping one
        # job per round — the same pattern as the graph fixpoints.
        # Fault-tolerance posture: executor-local by default (the
        # vocab frame is a bounded aggregate; a lost executor costs a
        # from-scratch retry), reliable when
        # $SPARK_GRAFT_CHECKPOINT_DIR is set (functions.lineage —
        # r12 verdict item 7).
        vocab = lineage_cut(
            vocab.withColumn("syms", apply_merge(F.col("syms"), a, b))
        )
    return merges, vocab


def bpe_encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Encode each distinct word with a FROZEN merge list (the
    production posture: the tokenizer is trained once — q114 /
    :func:`bpe_learn` — then applied everywhere).  Adds ``syms``
    (token array) and ``n_tokens``.

    All merges apply as chained codegen folds over the symbol array —
    no Python, no shuffle; run this on the DISTINCT-WORD table (vocab,
    ~1e6 rows at any corpus size) and broadcast-join the per-word token
    counts back onto the corpus, never fold per occurrence.

    ``merges`` accepts (left, right) pairs OR :func:`bpe_learn`'s
    (left, right, count) triples directly — the documented
    train-then-apply composition used to crash unpacking the count
    (r5 review catch)."""
    clash = [c for c in words.columns if c in ("syms", "n_tokens")]
    if clash:
        # withColumn silently REPLACES same-named columns: encoding
        # bpe_learn's final_vocab (which already carries `syms`) would
        # destroy the learned symbol table without an error
        raise ValueError(
            f"columns {clash} collide with bpe_encode_words' "
            "syms/n_tokens output names — rename or drop them first"
        )
    syms = char_symbols(F.col(word_col))
    for m in merges:
        a, b = m[0], m[1]
        syms = apply_merge(syms, a, b)
    return words.withColumn("syms", syms).withColumn(
        "n_tokens", F.size("syms").cast("long")
    )
