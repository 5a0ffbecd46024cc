"""Text primitives shared by the text-analysis and dedup operators.

Kept JVM-side (split/lower/regexp built-ins) so tokenization runs at scan
speed; every operator that consumes tokens gets them from here so Spark
and the DuckDB oracles agree on one tokenization contract:
``split(lower(text), '\\s+')`` minus empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")


def normalize_ws(text: Column | str) -> Column:
    """Whitespace-normalized lowercase text (dedup fingerprint input)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def gram_array(toks: "Column", k: int):
    """Word k-gram array over an (already tokenized) array column —
    THE one gram constructor: dedup.shingles (distinct variant) and
    contamination.repetition_ratio (multiplicity variant) both build
    from this, so the tokenize/sequence/slice/concat_ws contract can
    never silently diverge between them (r5 review catch).  Caller
    guards ``size(toks) >= k`` (sequence would run backwards)."""
    from pyspark.sql import functions as F

    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
