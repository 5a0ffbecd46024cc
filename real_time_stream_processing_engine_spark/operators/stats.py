"""Distribution-comparison statistics as exact-integer DataFrame plans.

The q301+ statistics wing (queries.py) computes nonparametric
two-sample tests and inequality curves from HISTOGRAMS, never from
pooled per-row rank sorts or O(n²) pair walks: group → per-value
counts → one ordered carry over the merged (or per-group cumulative)
histogram.  That keeps the shuffle proportional to |distinct values|,
not |rows|, and keeps every intermediate an exact integer — the final
ratio is one DECIMAL(38,0) division emitted in ppm/permille (the q198
overflow lesson: n·m and Σ-of-products cross int64 around 10⁹ rows²,
so the wide-decimal hop is load-bearing, not decorative).

Factored here so the queries (q315/q316/q324/q325) and the 4M-row
scale smoke (tests/test_scale_smoke.py) drive ONE audited code path.

Reference parity: the reference engine has no statistics surface at
all (its aggregate verb is count/sum/max/min/avg per key,
``Operators.java:13-19``); this module is north-star extension
territory per SURVEY.md §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "mann_whitney_u",
    "ks_statistic",
    "lorenz_points",
    "decile_table",
    "grouped_quantile_crossings",
    "distributed_cumsum",
]


def mann_whitney_u(a: DataFrame, b: DataFrame, value_col: str = "v") -> DataFrame:
    """Exact Mann-Whitney U between samples ``a`` and ``b`` (each a
    DataFrame with integer ``value_col``), from histograms.

    U_strict = Σ_a cnt_a · |{b < a}| via B's cumulative histogram,
    merged against A's values with ONE union-sort carry (the as-of
    pattern) instead of a per-value probe join; tie pairs counted
    separately so the half-tie convention folds in as 2U+T.  Returns
    one row: na, nb, u_strict, ties, rank_biserial_ppm where the
    effect size is (2U+T-nm)·1e6/(nm) — all products in
    DECIMAL(38,0) (nm·1e6 overflows int64 beyond ~3M×3M rows).
    """
    # NULLs are MISSING observations, not a rank position: groupBy
    # would keep a v=NULL histogram row that counts into na/nb while
    # contributing 0 to U (nulls sort first, below=0), biasing
    # rank_biserial_ppm toward "a smaller" by exactly the null share
    # (r9 review) — exclude them, the standard complete-case rule.
    av = a.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(value_col).alias("v")
    ).agg(F.count("*").alias("cnt_a"))
    bv = b.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(value_col).alias("v")
    ).agg(F.count("*").alias("cnt_b"))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cb = bv.select(
        "v",
        "cnt_b",
        F.coalesce(F.sum("cnt_b").over(wb), F.lit(0)).alias("below"),
    )
    ua = av.select(
        "v", "cnt_a", F.lit(None).cast("long").alias("below"),
        F.lit(None).cast("long").alias("cnt_b"), F.lit(0).alias("is_b"),
    )
    ub = cb.select(
        "v", F.lit(None).cast("long").alias("cnt_a"), "below",
        "cnt_b", F.lit(1).alias("is_b"),
    )
    u = ua.unionByName(ub)
    wc = Window.orderBy("v", F.col("is_b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = u.select(
        "v", "cnt_a", "is_b", "cnt_b",
        F.last(
            F.when(F.col("is_b") == 1, F.col("below") + F.col("cnt_b")),
            ignorenulls=True,
        )
        .over(wc)
        .alias("b_le"),
        F.last(
            F.when(F.col("is_b") == 1, F.struct("v", "cnt_b")),
            ignorenulls=True,
        )
        .over(wc)
        .alias("last_b"),
    ).filter(F.col("is_b") == 0)
    scored = carried.select(
        "cnt_a",
        F.coalesce(
            F.when(
                F.col("last_b.v") == F.col("v"),
                F.col("b_le") - F.col("last_b.cnt_b"),
            ).otherwise(F.col("b_le")),
            F.lit(0),
        ).alias("b_below"),
        F.coalesce(
            F.when(F.col("last_b.v") == F.col("v"), F.col("last_b.cnt_b")),
            F.lit(0),
        ).alias("b_tied"),
    )
    agg = scored.agg(
        F.sum(F.col("cnt_a").cast("decimal(38,0)") * F.col("b_below")).alias(
            "u_strict"
        ),
        F.sum(F.col("cnt_a").cast("decimal(38,0)") * F.col("b_tied")).alias(
            "ties"
        ),
        F.sum("cnt_a").cast("decimal(38,0)").alias("na"),
    )
    nb = bv.agg(F.sum("cnt_b").cast("decimal(38,0)").alias("nb"))
    return agg.crossJoin(F.broadcast(nb)).selectExpr(
        "CAST(na AS BIGINT) AS na",
        "CAST(nb AS BIGINT) AS nb",
        "CAST(u_strict AS BIGINT) AS u_strict",
        "CAST(ties AS BIGINT) AS ties",
        "CAST(((2 * u_strict + ties - na * nb) * 1000000)"
        " DIV (na * nb) AS BIGINT) AS rank_biserial_ppm",
    )


def ks_statistic(a: DataFrame, b: DataFrame, value_col: str = "v") -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance, exact: sup|F_A - F_B|
    over the merged cumulative histogram, cross-multiplied
    (|cumA·nb - cumB·na|) so no float CDF exists until the single
    ppm division.  Returns one row: na, nb, d_num, ks_ppm.

    The cross-multiply is the overflow surface: cum·n reaches
    na·nb ≈ 10¹³ at 3M×3M and d_num·1e6 ≈ 10¹⁹ crosses int64, so
    the sup and the ppm step run in DECIMAL(38,0).
    """
    # complete-case rule, same as mann_whitney_u (r9 review): a v=NULL
    # histogram row would be a spurious first CDF step — cuma jumps by
    # the null count at a point that is not a value, inflating the sup
    # (identical samples with one-sided nulls read as ks_ppm > 0)
    u = (
        a.filter(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).alias("v"),
            F.lit(1).alias("ca"),
            F.lit(0).alias("cb"),
        )
        .unionByName(
            b.filter(F.col(value_col).isNotNull()).select(
                F.col(value_col).alias("v"),
                F.lit(0).alias("ca"),
                F.lit(1).alias("cb"),
            )
        )
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = u.select(
        F.sum("ca").over(wc).cast("decimal(38,0)").alias("cuma"),
        F.sum("cb").over(wc).cast("decimal(38,0)").alias("cumb"),
        F.sum("ca").over(wall).cast("decimal(38,0)").alias("na"),
        F.sum("cb").over(wall).cast("decimal(38,0)").alias("nb"),
    )
    return c.agg(
        F.max("na").cast("long").alias("na"),
        F.max("nb").cast("long").alias("nb"),
        F.max(
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        )
        .cast("long")
        .alias("d_num"),
        F.expr(
            "CAST((max(abs(cuma * nb - cumb * na)) * 1000000)"
            " DIV (max(na) * max(nb)) AS BIGINT)"
        ).alias("ks_ppm"),
    )


def lorenz_points(keyed_sums: DataFrame, sum_col: str = "s",
                  key_col: str = "o_custkey", n_points: int = 10) -> DataFrame:
    """Lorenz curve: cumulative share of ``sum_col`` at each 1/n_points
    quantile of entities ranked ascending.  One ascending rank window
    over the per-entity aggregate; crossing values read at bucket
    boundaries; the share is exact DECIMAL ppm.  Returns
    (decile, n_cum, cum, cum_share_ppm) for deciles 1..n_points:
    point d reads at rank floor(d·n/n_points) — EXACTLY the d/n_points
    population boundary (ceil bucketing; point n_points = 1e6 ppm by
    construction, the checksum).

    SCALE LIMIT + SWAP: the global-order window runs its sort in one
    task, fine to ~10⁷ entities; beyond that, build the same (rk, cum)
    columns with :func:`distributed_cumsum` (range-partitioned
    two-pass prefix sum, pinned equal at 2M rows in
    tests/test_scale_smoke.py) and reuse :func:`decile_table` —
    exactly what q331 does.

    An entity with a NULL ``sum_col`` is a missing observation, not a
    zero: row_number would rank it (inflating n and shifting every
    boundary) while sum() skips it — excluded up front, the same
    complete-case rule as the rest of this module (r9 review)."""
    keyed_sums = keyed_sums.filter(F.col(sum_col).isNotNull())
    wr = Window.orderBy(sum_col, key_col)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = keyed_sums.select(
        F.col(sum_col).alias("s"),
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wall).alias("n"),
        F.sum(sum_col)
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum(sum_col).over(wall).alias("tot"),
    )
    return decile_table(r, n_points)


def decile_table(r: DataFrame, n_points: int = 10) -> DataFrame:
    """THE decile-bucketing tail shared by :func:`lorenz_points` and
    the q331 distributed-cumsum path — one audited copy, so a bucketing
    or ppm change cannot silently diverge between the two formulations
    the shared oracle pins together.

    Input: rows with (rk, cum, n, tot).  Bucketing is CEIL
    (``(n_points·rk + n - 1) DIV n``): bucket d's max rank is
    floor(d·n/n_points), so each emitted point is the cumulative share
    at exactly the d/n_points population boundary — a floor bucketing
    would shift every point one bucket late and emit no d=1 boundary
    at all.

    The reported cum is ``max_by(cum, rk)`` — the running sum AT the
    boundary row — never ``max(cum)`` (r9 review): with NEGATIVE
    values (net-of-refunds entities are in-contract for the generic
    cumsum path) the running sum dips and recovers, so a bucket's
    interior maximum can exceed its boundary value and ``max(cum)``
    would report a share for a rank the docstring does not promise."""
    return (
        r.selectExpr(
            f"CAST(({n_points} * rk + n - 1) DIV n AS BIGINT) AS decile",
            "rk", "cum", "tot",
        )
        .groupBy("decile")
        .agg(
            F.max("rk").cast("long").alias("n_cum"),
            F.expr("max_by(cum, rk)").cast("long").alias("cum"),
            F.expr(
                "CAST((CAST(max_by(cum, rk) AS DECIMAL(38,0)) * 1000000)"
                " DIV max(tot) AS BIGINT)"
            ).alias("cum_share_ppm"),
        )
    )


def grouped_quantile_crossings(df: DataFrame, group_col: str,
                               value_col: str) -> DataFrame:
    """P10/P90 per group as crossings of one per-group cumulative
    histogram (the ``min(v) where 10·cum ≥ q·n`` form — no global
    sort of rows, no percentile buffer), plus the P90/P10 ratio in
    exact integer permille.  Returns (group, n, p10, p90,
    p90_p10_permille).  The inequality quantile definition matches
    ``ceil(q·n)``-th order statistic with ascending ranks.

    NULL values are missing observations, excluded up front (the same
    complete-case rule as :func:`mann_whitney_u`, r9 review): a NULL
    histogram row sorts first in the cumulative window, inflating cum
    and n by the null count and shifting every crossing to an earlier
    real value — min() could never SELECT the null, but it still
    biased where the thresholds fell.  A NULL GROUP stays a normal
    group, matching Window.partitionBy semantics."""
    h = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count("*").alias("cnt"))
    wc = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select(
        "g",
        "v",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("n"),
    )
    return cum.groupBy(F.col("g").alias("group")).agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(10 * F.col("cum") >= F.col("n"), F.col("v")))
        .cast("long")
        .alias("p10"),
        F.min(F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("v")))
        .cast("long")
        .alias("p90"),
        # NULLIF guards the p10 divisor: the operator is generic over
        # value domains that may include 0 (r5 advice), and an explicit
        # NULL-on-zero holds under BOTH default and ANSI modes instead
        # of silently depending on non-ANSI DIV semantics.
        F.expr(
            "CAST((CAST(min(CASE WHEN 10 * cum >= 9 * n THEN v END)"
            " AS DECIMAL(38,0)) * 1000)"
            " DIV NULLIF(min(CASE WHEN 10 * cum >= n THEN v END), 0)"
            " AS BIGINT)"
        ).alias("p90_p10_permille"),
    )


#: Hard cap on the driver-side offsets table (|partitions| + groups
#: spanning boundaries rows for grouped cumsums).  1e6 rows is ~tens of
#: MB on the driver and as a broadcast — far above any sane use, far
#: below driver OOM.  Above it the grouped-window swap is the wrong
#: tool anyway: millions of SMALL groups parallelize fine under a plain
#: ``Window.partitionBy(group)`` (skew, not cardinality, is what this
#: function fixes), so the guard refuses loudly instead of collecting.
_MAX_OFFSET_ROWS = 1_000_000


def distributed_cumsum(df: DataFrame, order_cols: list[str],
                       value_col: str, num_partitions: int | None = None,
                       group_cols: list[str] | None = None,
                       max_offset_rows: int = _MAX_OFFSET_ROWS) -> DataFrame:
    """Exact global running sum + rank WITHOUT a single-partition
    window — the scale swap for every ``Window.orderBy(...)`` cumsum
    in this module (Lorenz, Gini, decile boundaries), whose one-task
    sort stops being acceptable somewhere around 10⁷-10⁸ rows.

    Classic two-pass distributed prefix sum:

    1. range-exchange on ``order_cols`` (``repartitionByRange`` —
       partition p holds a contiguous key range below partition p+1)
       and sort within each partition;
    2. per-partition totals (count + sum) — a tiny aggregate of
       |partitions| rows — cumulate DRIVER-SIDE into per-partition
       offsets and broadcast-join them back;
    3. within-partition running sum/rank (Window PARTITIONED by the
       range-partition id — every partition's window runs in
       parallel) plus the broadcast offsets.

    Returns the input columns plus ``rk`` (1-based global rank in
    ``order_cols`` order) and ``cum`` (inclusive running sum of
    ``value_col``).  Ties order identically to
    ``Window.orderBy(*order_cols)`` as long as ``order_cols`` is a
    total order (pass a tie-break key, exactly as the window form
    needs for determinism).  Driver traffic is |partitions| rows —
    bounded by the cluster, not the data.

    ``group_cols`` generalizes the swap to GROUPED cumulative sums
    (``Window.partitionBy(g).orderBy(...)``) whose skew problem is one
    giant group in one window task (q198's per-nation rank: 25 tasks
    each carrying 1/25 of all orders).  Groups range-partition
    CONTIGUOUSLY ahead of the order keys — a huge group spans several
    partitions, each handled in parallel — and rk/cum restart per
    group via per-(partition, group) offsets (≤ |groups| +
    |partitions| - 1 rows of driver traffic: contiguous layout means
    each extra row is a group spanning a partition boundary).  That
    bound is ENFORCED, not assumed: the collect is capped at
    ``max_offset_rows`` (default 1e6) via a LIMIT, so a
    data-cardinality group key can never OOM the driver — it raises
    with the fix (plain ``Window.partitionBy``, which handles many
    small groups fine; this function exists for the few-huge-groups
    skew case).
    """
    gcols = list(group_cols or [])
    # the offsets accumulate through Python int / Decimal and the final
    # cum is decimal(38,0): a fractional value column would be silently
    # FLOORED at every partition boundary — refuse it (r7 review; every
    # in-repo caller pre-casts to long for exactness anyway)
    vtype = dict(df.dtypes)[value_col]
    if not (
        vtype in ("bigint", "int", "smallint", "tinyint")
        or (vtype.startswith("decimal(") and vtype.endswith(",0)"))
    ):
        raise TypeError(
            f"distributed_cumsum needs an integral value column for an "
            f"exact running sum; {value_col} is {vtype} — cast to long "
            "or a scale-0 decimal (e.g. a fixed-point micro grid) first"
        )
    # output/helper collisions corrupt silently (withColumn REPLACES a
    # same-named column) or die deep inside the helper as an ambiguous
    # reference after the offsets join — refuse at entry with the real
    # cause, the same guard class as asof_join/salted_agg (r9 review)
    reserved = {"rk", "cum", "_pid", "_lrk", "_lcum", "_off_n", "_off_s"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"distributed_cumsum output/helper column(s) {clash} already "
            "exist on the input frame; rename them first (rk/cum are the "
            "outputs, _pid/_lrk/_lcum/_off_n/_off_s are scratch)"
        )
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = df.repartitionByRange(
        int(n_parts), *[F.col(c) for c in (*gcols, *order_cols)]
    ).sortWithinPartitions(*gcols, *order_cols)
    # materialize ONCE: the offsets pass and the final pass must see
    # the SAME partition assignment, and repartitionByRange's sampled
    # bounds are not guaranteed identical across re-executions — an
    # offset computed against one set of bounds applied to another
    # silently corrupts every global rank.  (At cluster scale this is
    # a persist to reliable storage; the sorted layout is the
    # expensive artifact both passes want to reuse anyway.)
    withpid = (
        ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    )
    # pass 1: bounded per-(partition[, group]) totals -> driver -> offsets.
    # The LIMIT makes the bound a guarantee: at most max_offset_rows + 1
    # rows ever reach the driver, and row cap+1 existing means the group
    # cardinality outgrew the offsets design — refuse with the remedy.
    totals = (
        withpid.groupBy("_pid", *gcols)
        .agg(F.count("*").alias("_n"), F.sum(value_col).alias("_s"))
        .orderBy("_pid", *gcols)
        .limit(max_offset_rows + 1)
        .collect()
    )
    if len(totals) > max_offset_rows:
        raise ValueError(
            f"distributed_cumsum offsets table exceeds max_offset_rows="
            f"{max_offset_rows} (group_cols={gcols} cardinality is "
            "data-sized). This function fixes FEW-HUGE-GROUPS skew; for "
            "many small groups use a plain Window.partitionBy(*group_cols)"
            " running sum, which parallelizes by group without driver "
            "offsets."
        )
    from decimal import Decimal

    off_rows, runs = [], {}
    for r in totals:
        gkey = tuple(r[c] for c in gcols)
        run_n, run_s = runs.get(gkey, (0, 0))
        off_rows.append((r._pid, *gkey, run_n, Decimal(run_s)))
        runs[gkey] = (
            run_n + r._n,
            run_s + (int(r._s) if r._s is not None else 0),
        )
    spark = df.sparkSession
    gschema = "".join(
        f"{c} {dict(df.dtypes)[c]}, " for c in gcols
    )
    off_schema = f"_pid int, {gschema}_off_n long, _off_s decimal(38,0)"
    offsets = spark.createDataFrame(off_rows, off_schema)
    # pass 2: parallel within-partition running sums + broadcast offsets
    w = (
        Window.partitionBy("_pid", *gcols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # eqNullSafe on the group keys: a plain equi-join would DROP every
    # NULL-group row here (NULL never equals NULL in a join), unlike
    # the Window.partitionBy this function documents itself as the
    # drop-in swap for, which treats NULL as a normal group (r7 review)
    local = withpid.withColumn("_lrk", F.count("*").over(w)).withColumn(
        "_lcum", F.sum(value_col).over(w)
    )
    cond = local["_pid"] == offsets["_pid"]
    for c in gcols:
        cond = cond & local[c].eqNullSafe(offsets[c])
    return (
        local.join(F.broadcast(offsets), cond)
        .drop(offsets["_pid"], *[offsets[c] for c in gcols])
        .withColumn("rk", (F.col("_off_n") + F.col("_lrk")).cast("long"))
        .withColumn(
            "cum", (F.col("_off_s") + F.col("_lcum")).cast("decimal(38,0)")
        )
        .drop("_pid", "_lrk", "_lcum", "_off_n", "_off_s")
    )
