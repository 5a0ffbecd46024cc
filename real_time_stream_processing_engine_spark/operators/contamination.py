"""Benchmark decontamination + repetition quality signals.

Training-data curation needs two more text measures the quality scorer
(operators/text.py) doesn't cover:

- **decontamination**: flag corpus documents sharing too many n-grams
  with a benchmark/eval set, so test data never leaks into training
  data.  The benchmark's gram set is tiny relative to the corpus — the
  join must broadcast it and never shuffle the corpus.
- **repetition ratio** (Gopher-style): fraction of a document's grams
  accounted for by its single most frequent gram — high values mean
  degenerate boilerplate/looping text.

Both stay JVM-side and oracle-reproducible (same tokenization contract
as every other text operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokenize
from .dedup import shingles


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_ratio: float = 0.2,
) -> DataFrame:
    """Corpus documents whose distinct k-gram sets overlap a benchmark
    set by at least ``min_ratio`` (overlap / doc's gram count).

    Shape for 100 TB: the benchmark side reduces to its DISTINCT gram
    hashes (a few MB for any real eval suite) and is broadcast —
    Catalyst plans the probe as a broadcast semi-ish inner join against
    the corpus gram stream, so the corpus is never shuffled for the
    join; the only exchange is the per-doc overlap aggregate, which
    carries one counter per contaminated doc.  Gram hashing (xxhash64)
    keeps the probe key 8 bytes."""
    # shingles is ALREADY distinct per doc — the old collect_set round
    # trip shuffled every document's full gram set (and buffered a
    # multi-GB doc's set in one aggregation buffer) only to explode it
    # straight back (r5 review catch).  Instead: broadcast LEFT join
    # marks each gram hit-or-not at the scan, then ONE counter-only
    # aggregate computes total and overlap together — one corpus scan,
    # one exchange carrying two counters per doc.
    c = shingles(corpus.select(id_col, text_col), text_col, k=k).select(
        id_col, F.xxhash64("shingle").alias("gram")
    )
    bench = (
        shingles(benchmark.select(text_col), text_col, k=k)
        .select(F.xxhash64("shingle").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        c.join(F.broadcast(bench), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_n_grams"),
            F.count("_hit").alias("n_overlap"),
        )
        .select(
            id_col,
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("_n_grams"), 6).alias(
                "overlap_ratio"
            ),
        )
        .filter(F.col("overlap_ratio") >= min_ratio)
    )


def repetition_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
) -> DataFrame:
    """Per-document top-gram repetition ratio:
    ``count(most frequent k-gram) / count(all k-grams)`` (duplicated
    grams INCLUDED — repetition is the signal, so no dedup).

    One gram explode, one (doc, gram) count aggregate, one per-doc
    max/sum aggregate — two exchanges, payload one counter per distinct
    gram then one row per doc.  Docs shorter than k tokens are skipped
    (no grams, ratio undefined)."""
    from ..functions.textfn import gram_array

    toks = df.select(id_col, F.col(text_col))
    g = (
        toks.withColumn("_toks", tokenize(text_col))
        .filter(F.size("_toks") >= k)
        .select(id_col, F.explode(gram_array(F.col("_toks"), k)).alias("gram"))
    )
    per_gram = g.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        F.round(F.max("c") / F.sum("c"), 6).alias("repetition_ratio"),
    )
