"""Vector math over ``array<float>`` columns — JVM-side only.

Built from higher-order functions (``zip_with`` / ``aggregate``) so the
hot path stays inside whole-stage codegen: no Python round-trip, no Arrow
transfer, vectorizable by Tungsten.  At 100 TB this is the difference
between a scan-speed similarity pass and a Python-bound one.

All arithmetic is promoted to double before summation so results match a
double-precision oracle bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """``array<double>`` literal as ONE parsed expression.

    The Column-API comprehension (``F.array(*[F.lit(float(v)) ...])``)
    costs one-plus py4j round trips per element — ~35 ms per 64-dim
    vector, and seconds per query for codebooks/LUTs/sign matrices
    (r12 opt: the bench times query BUILD too; q110's 16x64 sign
    matrix alone was ~1.1 s of driver chatter).  ``repr(float)`` emits
    the shortest digits that round-trip, and Spark's literal parser
    (Java ``Double.parseDouble``) is correctly rounded, so the doubles
    are bit-identical to ``F.lit(float(v))``."""
    vals = [float(v) for v in values]
    if not vals:
        return F.expr("CAST(array() AS array<double>)")
    parts = []
    for v in vals:
        if v != v:  # NaN
            parts.append("CAST('NaN' AS DOUBLE)")
        elif v in (float("inf"), float("-inf")):
            parts.append(f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)")
        else:
            parts.append(repr(v) + "D")
    return F.expr("array(" + ",".join(parts) + ")")


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
