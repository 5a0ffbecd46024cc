"""The reference operator surface as pure DataFrame transforms.

The reference compiles five operator shapes from strings
(``Operators.java:13-19``: FILTER, TRANSFORM, FILTERED_TRANSFORM,
AGGREGATE, COLUMN_FILTER) and interprets them tuple-at-a-time with a
``process(String) -> List<String>`` flatMap contract
(``Operators.java:73-110``).  Here each operator is a named, parameterized
``DataFrame -> DataFrame`` function; Catalyst fuses and reorders them
(whole-stage codegen replaces the manual FILTERED_TRANSFORM fusion at
``Operators.java:48-54``), and the same transforms apply unchanged to
streaming DataFrames.

Everything stays JVM-side — no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]

#: default text column for line-oriented operators (the reference's unit
#: of data is one text line, ``Node.java:607-677``)
LINE_COL = "value"


def filter_contains(pattern: str, col: str = LINE_COL) -> Transform:
    """O1 FILTER — keep rows whose ``col`` contains ``pattern``,
    case-insensitive substring; surrounding quotes stripped from the
    pattern (reference predicate ``Operators.java:121-144``).

    Compiles to a single JVM ``Contains`` predicate inside whole-stage
    codegen; on a parquet scan of a string column Catalyst pushes the
    non-lowered prefilter down where possible.
    """
    p = pattern.strip('"').lower()

    def _t(df: DataFrame) -> DataFrame:
        return df.filter(F.lower(F.col(col)).contains(F.lit(p)))

    return _t


def column_filter(column: str, value: str) -> Transform:
    """O2 COLUMN_FILTER — equality on a named column.

    The reference resolves the name to a CSV ordinal against its fixed
    schema and string-compares ``split(",")[idx].trim()``
    (``Operators.java:258-277``, resolution ``Node.java:412-437``).  Here
    name resolution is Catalyst's analyzer, and the trimmed-equality
    predicate is pushed down to the scan (PushedFilters on parquet when
    the stored values need no trim).
    """
    v = value.strip('"')

    def _t(df: DataFrame) -> DataFrame:
        return df.filter(F.trim(F.col(column)) == F.lit(v))

    return _t


def _line_transform(fn: Callable[[Column], Column], col: str) -> Transform:
    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(col, fn(F.col(col)))

    return _t


def transform_upper(col: str = LINE_COL) -> Transform:
    """O3 TRANSFORM:uppercase (``Operators.java:159-160``)."""
    return _line_transform(F.upper, col)


def transform_lower(col: str = LINE_COL) -> Transform:
    """O4 TRANSFORM:lowercase (``Operators.java:161-162``)."""
    return _line_transform(F.lower, col)


def transform_trim(col: str = LINE_COL) -> Transform:
    """O5 TRANSFORM:trim (``Operators.java:163-164``)."""
    return _line_transform(F.trim, col)


def split_into_words(col: str = LINE_COL, out: str = "word") -> Transform:
    """O6 TRANSFORM:splitintowords — as a true flatMap.

    The reference re-joins tokens with ``\\n`` into one string
    (``Operators.java:165-167``); the honest relational form is
    explode(split), which is what every downstream word-count actually
    wants.  Empty tokens (leading/trailing whitespace) are dropped.
    """

    def _t(df: DataFrame) -> DataFrame:
        return df.select(
            *[c for c in df.columns if c != col],
            F.explode(F.split(F.col(col), r"\s+")).alias(out),
        ).filter(F.col(out) != "")

    return _t


def select_columns(*cols: str) -> Transform:
    """O7 TRANSFORM:select — projection (``Operators.java:146-154``,
    name resolution ``Node.java:439-470``).  Column pruning then reaches
    the scan for free (ReadSchema shows only these columns)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.select(*cols)

    return _t


def filtered_transform(pattern: str, transform: Transform, col: str = LINE_COL) -> Transform:
    """O8 FILTERED_TRANSFORM — fused filter+map (``Operators.java:48-54``).

    No manual fusion needed: Catalyst pipelines filter and project into
    one codegen stage.  (The reference's deserializer drops the predicate
    — ``Operators.java:235-237`` — a bug we do not replicate.)
    """
    pred = filter_contains(pattern, col)

    def _t(df: DataFrame) -> DataFrame:
        return transform(pred(df))

    return _t


_AGG_FNS: dict[str, Callable[[str], Column]] = {
    "count": F.count,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
}


def aggregate(
    function: str = "count",
    field: str | None = None,
    keys: tuple[str, ...] = (),
    alias: str | None = None,
) -> Transform:
    """O9 AGGREGATE — generalized.

    The reference implements only a running total count in a task-local
    HashMap (``Operators.java:21``, ``:93-100``) that can overcount under
    retry (unused dedup set, ``Node.java:117``); its CLI *advertises*
    ``AGGREGATE:function:field`` with sum/count/max/min
    (``RainStorm.java:888-891``) but never builds it.  We implement the
    advertised semantics for real: keyed or global count/sum/max/min/avg
    with exact results (map-side partial aggregation + exchange on the
    group keys — Spark's HashAggregate pair).

    In streaming, the same transform runs in update/complete mode with
    checkpointed state — the exactly-once version of the reference's
    running count.
    """
    if function.lower() not in _AGG_FNS:
        raise ValueError(
            f"unknown aggregate {function!r}; supported: "
            f"{sorted(_AGG_FNS)}"
        )
    fn = _AGG_FNS[function.lower()]
    if field is None and function.lower() != "count":
        # only count('*') is meaningful without a field; sum('*') would
        # otherwise surface as an opaque Spark analysis error far from
        # the user's typo (r5 review catch)
        raise ValueError(f"AGGREGATE:{function} requires a field")
    target = field if field is not None else "*"
    name = alias or (function.lower() if field is None else f"{function.lower()}_{field}")

    def _t(df: DataFrame) -> DataFrame:
        agg_col = fn(target).alias(name)
        if keys:
            return df.groupBy(*keys).agg(agg_col)
        return df.agg(agg_col)

    return _t


def pipe(*ops: Transform) -> Transform:
    """O10 — operator chaining.

    The reference supports exactly two operators per job, materializing
    op1's results file as op2's input (``Node.java:1106-1160``).  Here a
    pipeline is ordinary composition of lazy DataFrame transforms —
    arbitrary depth, no intermediate materialization, one optimized plan.
    """

    def _t(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return _t
