"""Z-order (Morton-curve) clustered layouts for multi-dimensional
data skipping.

A single-column sort gives parquet min/max pruning on ONE predicate
dimension; every other dimension's values smear across the full range
in every file, so a 2-d box probe still touches everything the first
dimension admits.  Interleaving the bits of two (or more) scaled
columns and range-partitioning + sorting on that Morton code gives
every file a small min/max BOX in all interleaved dimensions at once —
the standard lakehouse clustering trick (Delta/Iceberg `ZORDER BY`),
re-expressed here with nothing but built-in column expressions (pure
codegen, no UDF) and the same manifest-idempotent build contract as the
IVF/BM25/date-partition indexes.

At 100 TB the economics are the whole point: the cluster write is one
range-exchange paid ONCE, and every subsequent box probe reads only the
files whose z-range intersects the box — row-group stats do the rest
inside each file.  The reference has no layout control at all beyond
append order (HyDFS chunk placement is hash-based,
``RainStorm.java:487-497``), so every scan is a full scan.

The z-value never participates in query RESULTS — it only places rows.
Probes filter on the ORIGINAL columns, so correctness never depends on
the scaling math, and the oracle runs against the flat table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import replace_contents
from .indexing import (
    manifest_matches,
    params_fingerprint,
    source_params,
    write_manifest,
)

ZCOL = "_zval"


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into [0, 2**bits - 1] as a long.

    Degenerate range (hi == lo) maps everything to 0 — the dimension
    carries no information and the curve degrades to a sort on the
    other dimension, which is the right fallback."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(n + 1))
        / F.lit(float(hi - lo))
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n).cast("long"), scaled))


def zvalue(
    col_a: Column,
    col_b: Column,
    range_a: tuple[float, float],
    range_b: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton code of two numeric columns: bit i of each scaled value
    lands at positions 2i+1 / 2i.  2*bits boolean-arithmetic terms,
    all inside whole-stage codegen."""
    a = _scaled(col_a, *range_a, bits)
    b = _scaled(col_b, *range_b, bits)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).alias(ZCOL)


def build_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = 16,
    source_path: str | None = None,
    force: bool = False,
) -> None:
    """Materialize ``df`` z-order-clustered on (col_a, col_b).

    One bounded 1-row driver read fixes the scaling ranges (global
    min/max of both columns — an agg, not a collect of data rows); the
    write is ``repartitionByRange`` on the z-value (range exchange =
    contiguous curve segments per file) plus an in-partition sort so
    row groups inside each file are curve-contiguous too.  The z-value
    column is kept in the layout: it documents cluster membership and
    lets a future re-cluster diff curve segments without recomputing.

    Idempotent via the shared manifest contract: parameter or
    source-data changes invalidate; a crash mid-write leaves the old
    layout intact (atomic swap in ``replace_contents``)."""
    spark = df.sparkSession
    params = {
        "op": "zorder",
        "cols": [col_a, col_b],
        "n_files": n_files,
        "bits": bits,
        **source_params(spark, source_path),
    }
    fp = params_fingerprint(params)
    if not force and manifest_matches(spark, path, fp):
        return
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).head()
    if lo_a is None or lo_b is None:
        # empty input or an all-NULL cluster column: float(None) would
        # TypeError after the manifest check but before any write, and
        # every retry re-crashes (r5 review catch) — name the problem
        raise ValueError(
            f"cannot z-order {path}: no non-null values in "
            f"({col_a!r}, {col_b!r}) — empty input or all-NULL column"
        )
    z = df.withColumn(
        ZCOL,
        zvalue(
            F.col(col_a),
            F.col(col_b),
            (float(lo_a), float(hi_a)),
            (float(lo_b), float(hi_b)),
            bits,
        ),
    )
    clustered = z.repartitionByRange(n_files, F.col(ZCOL)).sortWithinPartitions(
        ZCOL
    )
    replace_contents(clustered, path)
    write_manifest(spark, path, fp)


def read_zordered(spark: SparkSession, path: str) -> DataFrame:
    """Open a z-ordered layout (the z-value column rides along; selects
    that don't name it prune it at the scan)."""
    return spark.read.parquet(path)
