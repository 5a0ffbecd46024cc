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
