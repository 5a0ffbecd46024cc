"""Skew mitigation — salting utilities for the keys AQE can't save.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew by splitting oversized partitions, but two shapes still need
explicit salting at 100 TB:

- a *single* mega-key in a shuffle aggregate (AQE cannot split one
  hash-aggregate key across tasks);
- a skewed join where the hot key's rows exceed one executor's memory
  even after AQE splits (the build side must be replicated).

Both utilities are pure DataFrame composition — no custom partitioner,
no RDDs — so Catalyst still optimizes around them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread_salt(n_salt: int):
    """Salt in [0, n_salt) from the physical row position — spreads
    byte-identical duplicate rows, which a content hash cannot: a hot
    key made of identical rows would hash to ONE salt value and
    re-concentrate in a single task, silently defeating the mitigation
    (r5 review catch).  Aggregation and the salted join are both
    correct under ANY salt assignment, so retry/repartition
    nondeterminism of the salt is harmless.

    ``n_salt`` must be >= 1 — refused here, once, at the driver:
    pmod(x, 0) yields NULL salts off-ANSI, and in the salted JOIN a
    NULL salt never equi-matches, silently returning zero rows (inner)
    or all-NULL small columns (left) with a successful job (r7
    review)."""
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salt),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str | list[str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group-by keys.

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``n_salt`` tasks — phase 2 re-aggregates the partials on the bare
    keys (tiny input: n_salt rows per key).  ``aggs`` maps column ->
    one of sum/count/min/max (the re-aggregable functions; avg callers
    decompose into sum+count).  ``count`` follows SQL ``count(col)``
    semantics — nulls in the named column are excluded, exactly like
    ``groupBy().agg(F.count(col))`` — so the salted result is a drop-in
    replacement for the unsalted aggregate.  A column may map to a
    LIST of functions (``{"v": ["sum", "count"]}``) — how an avg
    decomposes; a plain dict cannot name the same column twice
    (r5 review catch).

    The salt spreads by physical row position (:func:`_spread_salt`),
    not by content hash.
    """
    clash = [
        c for c in df.columns if c == "_salt" or c.startswith("_p_")
    ]
    if clash:
        # withColumn/alias silently REPLACE same-named columns — a real
        # `_salt` would be overwritten by the spread salt and a `_p_*`
        # partial would shadow user data (r8 review; same reserved-
        # scratch contract as cdc's _u_* and bloom_prefilter's _bp_p*)
        raise ValueError(
            f"columns {clash} collide with salted_agg's _salt/_p_* "
            "scratch names — rename them first"
        )
    supported = {"sum", "count", "min", "max"}
    norm: list[tuple[str, str]] = []
    for c, fns in aggs.items():
        for fn in [fns] if isinstance(fns, str) else list(fns):
            if fn not in supported:
                raise ValueError(f"non-reaggregable function: {fn!r}")
            norm.append((c, fn))
    out_names = [f"{fn}_{c}" for c, fn in norm]
    out_clash = sorted(
        {n for n in out_names if n in keys or out_names.count(n) > 1}
    )
    if out_clash:
        # agg() happily emits duplicate-named columns, so `keys=
        # ["sum_v"], aggs={"v": "sum"}` (or a repeated fn in a list)
        # would return two `sum_v` columns — ambiguous on any
        # downstream reference instead of an error here
        raise ValueError(
            f"output names {out_clash} collide with the group keys or "
            "each other — rename the key or aggregate different columns"
        )
    salt = _spread_salt(n_salt)
    partial_exprs, final_exprs = [], []
    for c, fn in norm:
        p = f"_p_{c}_{fn}"
        partial_exprs.append(getattr(F, fn)(c).alias(p))
        refn = "sum" if fn in ("sum", "count") else fn  # partials re-combine
        final_exprs.append(getattr(F, refn)(p).alias(f"{fn}_{c}"))
    partials = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partials.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-heavy big side against a small side by salting.

    The big side gets a deterministic salt in [0, n_salt); the small
    side is replicated n_salt times (explode of a literal sequence), so
    every (key, salt) bucket finds its match.  The hot key's rows land
    on n_salt different tasks instead of one.  Use when the small side
    is too big to broadcast but the big side's key histogram is spiky
    beyond what AQE's split threshold handles.

    Only inner/left joins are sound: a right/full outer join would
    emit each UNMATCHED small-side row once per replica (n_salt times).
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    clash = [c for c in (*big.columns, *small.columns) if c == "_salt"]
    if clash:
        raise ValueError(
            "a real `_salt` column on either side would be silently "
            "overwritten by the join salt — rename it first"
        )
    # position-derived salt: join correctness never depends on WHICH
    # salt a big-side row takes (the small side is replicated for every
    # value), so spreading is the only requirement
    b = big.withColumn("_salt", _spread_salt(n_salt).cast("int"))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    joined = b.join(s, [on, "_salt"], how)
    return joined.drop("_salt")
