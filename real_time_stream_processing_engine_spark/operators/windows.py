"""Event-time operators: tumbling windows, sessionization, grouped
top-k, and as-of joins.

The reference has no event time at all (time appears only in its
failure detector — SURVEY.md §2.5); these are the streaming-native
generalizations, expressed so batch and Structured Streaming share the
shapes.  Timestamps are compared in integer epoch units (seconds for
windows, microseconds for session gaps) for oracle-exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width_sec: int = 3600,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregate keyed on (window_start, key).

    Window assignment is a pure map (no bucketize shuffle); the single
    exchange is the aggregate's, partial-aggregated map-side.  The
    streaming twin is ``groupBy(window(ts, ...), key)`` with a watermark
    — same logical result, checkpointed state."""
    wstart = (F.floor(F.unix_timestamp(ts_col) / width_sec) * width_sec).cast("long")
    return (
        df.select(wstart.alias("window_start"), F.col(key_col), F.col(value_col))
        .groupBy("window_start", key_col)
        .agg(F.count("*").alias("cnt"), F.round(F.sum(value_col), 2).alias("sum_value"))
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_sec``.

    Classic lag + running-sum-of-boundaries; one shuffle on the user
    key, per-user sort inside partitions.  Skewed power users are the
    scale hazard — AQE skew handling plus a per-user daily pre-split
    are the mitigations, not a different algorithm.  Gaps are compared
    in whole microseconds (``unix_micros``) so an oracle agrees
    exactly.  Rows with a NULL ``ts_col`` are EXCLUDED up front (a
    timestamp-less event has no position on the session axis; the old
    fall-through silently made each one its own one-event session —
    r7 review).  ``tiebreak_col`` orders equal-timestamp events (it
    was a hard-coded ``event_id``, crashing on any other frame)."""
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    new_sess = F.when(
        (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_sec * 1_000_000),
        1,
    ).otherwise(0)
    sess = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            us.alias("_us"),
            new_sess.alias("_new"),
        )
        .withColumn("session_id", F.sum("_new").over(w).cast("long"))
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("session_start_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    )


def topk_per_group(
    df: DataFrame,
    key_col: str = "event_type",
    order_col: str = "value",
    tiebreak_col: str = "event_id",
    k: int = 3,
) -> DataFrame:
    """Deterministic grouped top-k via row_number (desc value, asc
    tiebreak).  Spark runs this as a partial top-k inside each map task
    (WindowGroupLimit pushes rank<=k below the shuffle) so the exchange
    carries k rows per key per partition, not the whole input."""
    w = Window.partitionBy(key_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(key_col, tiebreak_col, order_col, "rk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_s: int | None = None,
    out_prefix: str = "asof_",
    unit: str = "s",
) -> DataFrame:
    """General as-of join (pandas ``merge_asof`` semantics, distributed):
    every left row gets the nearest right row per key — at-or-before its
    timestamp (``backward``) or at-or-after (``forward``) — optionally
    only within ``tolerance_s`` seconds; unmatched left rows keep nulls.

    GRANULARITY is declared by ``unit``: the default ``"s"`` compares
    whole epoch SECONDS (the oracle-pinned semantics of the q25/q48
    family — DuckDB models it as ``floor(epoch(ts))``), which means
    sub-second data rounds to its second and a backward match can pick
    a right row up to 999 ms later within that second (r7 review).
    Pass ``unit="us"`` for microsecond-exact positions on sub-second
    feeds; ``tolerance_s`` stays in seconds either way.

    Same union-sort-carry shape as :func:`asof_join_last_order` (ONE
    exchange of |left|+|right| on the key, per-key sort, window carry —
    no range join, no per-row probe, the 100 TB plan), generalized:

    - all ``value_cols`` ride in ONE struct so they come from the SAME
      matched row (per-column ``last(ignorenulls)`` could mix rows);
    - right-side ties on the timestamp break by the struct's lexical
      order (ts, then value_cols in the order given) — deterministic,
      and reproducible by an oracle ranking DESC on the same columns;
    - tolerance filters AFTER the carry: the carried match is the
      nearest by construction, so if it misses the window every other
      candidate does too."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if unit not in ("s", "us"):
        raise ValueError(f"unit must be 's' or 'us', got {unit!r}")
    epoch = F.unix_timestamp if unit == "s" else F.unix_micros
    tol = None if tolerance_s is None else int(tolerance_s) * (1 if unit == "s" else 1_000_000)
    # helper/output name collisions silently corrupt the final
    # select(*left.columns) — refuse like regex_redact does (r7 review)
    out_names = [f"{out_prefix}ts"] + [f"{out_prefix}{c}" for c in value_cols]
    # the output names must be distinct AMONG THEMSELVES too (r9
    # review): value_cols containing 'ts' (or an internal duplicate)
    # collapses silently in the reserved SET below, and the final
    # select then emits two identically-named columns — every
    # downstream reference hits AMBIGUOUS_REFERENCE
    dups = sorted({n for n in out_names if out_names.count(n) > 1})
    if dups:
        raise ValueError(
            f"asof_join output column(s) {dups} would be emitted twice "
            f"(value_cols {value_cols!r} collide with the {out_prefix}ts "
            "match timestamp or each other); rename or drop the "
            "duplicate value column"
        )
    reserved = {"_aj_t", "_aj_m", "_aj_is_r", "_aj_match"} | set(out_names)
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output/helper columns {sorted(clash)} already "
            "exist on the left frame; rename them or pass another "
            "out_prefix"
        )
    match = F.struct(
        epoch(right[right_ts]).cast("long").alias("_mts"),
        *[right[c].alias(c) for c in value_cols],
    )
    # a null right timestamp would sort first (asc nulls-first) and its
    # NON-null match struct would be carried onto every otherwise-
    # unmatched left row — drop timestamp-less right rows up front
    r = right.filter(right[right_ts].isNotNull()).select(
        right[on].alias(on),
        epoch(right[right_ts]).cast("long").alias("_aj_t"),
        match.alias("_aj_m"),
        F.lit(1).alias("_aj_is_r"),
    )
    l = (
        left.withColumn("_aj_t", epoch(left[left_ts]).cast("long"))
        .withColumn("_aj_m", F.lit(None).cast(r.schema["_aj_m"].dataType))
        .withColumn("_aj_is_r", F.lit(0))
    )
    u = r.unionByName(l, allowMissingColumns=True)
    t_order = F.col("_aj_t").asc() if direction == "backward" else F.col("_aj_t").desc()
    w = (
        Window.partitionBy(on)
        # right rows first at equal timestamps ("at-or-..."); equal-ts
        # right rows ordered by the match struct so last() is the max
        .orderBy(t_order, F.col("_aj_is_r").desc(), F.col("_aj_m").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_aj_match", F.last("_aj_m", ignorenulls=True).over(w))
    out = carried.filter(F.col("_aj_is_r") == 0)
    # a NULL left timestamp has no as-of position: mask any carried
    # match (forward's desc() sorts nulls LAST, where the carry would
    # otherwise hand them the minimum-ts right row; backward's asc()
    # is already null-first/none-carried) (r5 review catch)
    out = out.withColumn(
        "_aj_match", F.when(F.col("_aj_t").isNotNull(), F.col("_aj_match"))
    )
    if tol is not None:
        delta = (
            F.col("_aj_t") - F.col("_aj_match._mts")
            if direction == "backward"
            else F.col("_aj_match._mts") - F.col("_aj_t")
        )
        out = out.withColumn(
            "_aj_match", F.when(delta <= tol, F.col("_aj_match"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_aj_match._mts").alias(f"{out_prefix}ts"),
        *[F.col(f"_aj_match.{c}").alias(f"{out_prefix}{c}") for c in value_cols],
    )



def _tag_orders_events_union(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Tag-and-union for the orders/events as-of family — the key
    shift (o_custkey-1 = user_id), epoch derivation, and side tags in
    ONE place shared by the backward and nearest variants (r5 review:
    a fix to the shift applied to one copy would silently skip the
    other)."""
    o = orders.select(
        (F.col("o_custkey") - 1).alias("user_id"),
        F.col("o_orderdate").alias("_t"),
        F.unix_timestamp("o_orderdate").alias("_order_epoch"),
        F.lit(1).alias("_is_order"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = events.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(None).cast("long").alias("_order_epoch"),
        F.lit(0).alias("_is_order"),
        "event_id",
    )
    return o.unionByName(e)


def asof_join_last_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: for each event, the most recent order (by orderdate)
    of customer ``user_id + 1`` at-or-before the event timestamp.

    Implemented as the scalable union-sort-carry pattern: tag both
    sides, union, one shuffle on the join key, per-key sort by time,
    then ``last(..., ignorenulls)`` carries the latest order value onto
    each event row.  Cost is a single exchange of |events|+|orders| —
    no range join, no per-event probe, no correlated subquery.  This is
    the 100 TB shape; a broadcast variant applies when one side is tiny."""
    u = _tag_orders_events_union(events, orders)
    # at equal timestamps the order row sorts first => "at-or-before"
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("last_order_epoch", F.last("_order_epoch", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_order") == 0).select(
        "event_id", "user_id", "last_order_epoch"
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    n_bins: int = 64,
) -> DataFrame:
    """Two-phase grid skyline (Pareto frontier): keep rows no other row
    beats on BOTH ``minimize`` (lower better) and ``maximize`` (higher
    better); exact ties on both survive together.

    Phase 1 bins the minimized column into fixed-width cells (bounds
    from one 1-row agg) and broadcasts the strictly-lower-cell prefix
    maxima of the maximized column — dominated rows die AT THE SCAN.
    Every true skyline row provably survives (its dominator would sit
    in a cheaper cell).  Phase 2 runs the exact single-pass sweep over
    the surviving sliver's distinct value pairs (ascending sort +
    running max over strictly-preceding rows) and joins survivors back
    by pair.  The quadratic NOT-EXISTS definition is the oracle
    contract; this is its linear-ish distributed evaluation.

    Rows with a NULL coordinate are EXCLUDED up front: a null can
    neither dominate nor be dominated under the NOT-EXISTS contract,
    and letting one through used to both bin it into the top cell
    (F.least skips nulls) and seed phase 2's running max, deleting
    genuine frontier rows (r5 review catch).  An empty (or all-null)
    input returns an empty frame instead of a driver TypeError."""
    from pyspark.sql import Window

    df = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    lo, hi = df.agg(F.min(minimize), F.max(minimize)).head()
    if lo is None:
        return df  # no rows survive the null filter: empty, same schema
    width = (float(hi) - float(lo)) / n_bins or 1.0
    binned = df.withColumn(
        "_sk_bin",
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(minimize) - F.lit(float(lo))) / F.lit(width)),
        ).cast("int"),
    )
    cell_max = {
        int(r["_sk_bin"]): r["mx"]
        for r in binned.groupBy("_sk_bin").agg(F.max(maximize).alias("mx")).collect()
    }
    prefix, run = {}, None
    for b in range(n_bins):
        prefix[b] = run
        if b in cell_max:
            run = cell_max[b] if run is None else max(run, cell_max[b])
    sentinel = float("-inf")
    # The prune must be CONSERVATIVE under float rounding (r9 review):
    # int64/decimal values past 2^53 can alias when cast to double, so
    # a true-frontier row could compare == (or, past 2^54, a hair
    # below) a prefix max it actually exceeds and be killed before the
    # exact phase-2 sweep ever sees it.  Two-sided fix: each prefix
    # literal steps ONE ULP DOWN (a double is then certainly < any
    # exact value that exceeds the true max) and the comparison is >=
    # (double rounding is monotone, so exact-X > literal implies
    # double(X) >= literal).  Dominated rows this lets through are
    # removed exactly by phase 2; nothing non-dominated is killed at
    # any magnitude.
    import math

    pref_arr = F.array(
        *[
            F.lit(
                sentinel
                if prefix[b] is None
                else math.nextafter(float(prefix[b]), float("-inf"))
            )
            for b in range(n_bins)
        ]
    )
    survivors = binned.filter(
        F.col(maximize).cast("double")
        >= F.element_at(pref_arr, F.col("_sk_bin") + 1)
    ).drop("_sk_bin")
    pairs = survivors.select(minimize, maximize).distinct()
    w = Window.orderBy(F.asc(minimize), F.desc(maximize)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_pairs = (
        pairs.withColumn("_sk_runmax", F.max(maximize).over(w))
        .filter(
            F.col("_sk_runmax").isNull()
            | (F.col(maximize) > F.col("_sk_runmax"))
        )
        .select(minimize, maximize)
    )
    return survivors.join(F.broadcast(sky_pairs), [minimize, maximize])


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_sec",
    end_col: str = "end_sec",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Max concurrent intervals per time bucket — the DISTRIBUTED
    sweep-line.  An interval [s, e] is active at every integer second
    s <= t <= e; the output is, per bucket that contains at least one
    boundary, the maximum number of simultaneously active intervals.

    The naive sweep is a single global running sum over every
    boundary — one partition, one task, dead at scale.  This is the
    two-phase decomposition:

    1. Boundaries (+1 at s, -1 at e+1) partial-aggregate to a net
       delta per (bucket, t) — one exchange, map-side combined.
    2. WITHIN each bucket: prefix sums and their max via a window
       partitioned by bucket (parallel across buckets; work per task
       bounded by boundaries-per-bucket, not corpus size).
    3. ACROSS buckets: per-bucket net totals — |buckets| rows, bounded
       by the time span (~9k/year), NOT the data volume — get a
       cumulative offset via one tiny single-partition window; the
       offset joins back broadcast.

    Max concurrency in a bucket = carry-in offset + max(0, best
    within-bucket prefix) (the max(0,·) covers a bucket whose first
    boundary is a departure: concurrency peaked at bucket start).
    This is the same partial/total split Spark's own partial
    aggregates use, applied to a prefix-sum — the only global step is
    over buckets, which 100x data growth does not grow."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    # an interval with a NULL bound has no sweep position — and a
    # ONE-sided NULL is worse than useless: its lone ±1 lands in a
    # NULL bucket that the across-window's orderBy sorts FIRST, so the
    # unmatched delta corrupts the carry of EVERY real bucket and a
    # spurious bucket_start=NULL row is emitted (r9 review).  Exclude
    # whole rows up front — the same null-coordinate policy as
    # sessionize and skyline_2d.
    iv = intervals.filter(s.isNotNull() & e.isNotNull())
    deltas = iv.select(s.alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select((e + 1).alias("t"), F.lit(-1).alias("d"))
    )
    net = (
        deltas.withColumn("bucket", F.floor(F.col("t") / bucket_sec) * bucket_sec)
        .groupBy("bucket", "t")
        .agg(F.sum("d").alias("nd"))
    )
    in_bucket = Window.partitionBy("bucket").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefixed = net.withColumn("prefix", F.sum("nd").over(in_bucket))
    per_bucket = prefixed.groupBy("bucket").agg(
        F.max("prefix").alias("inmax"),
        F.sum("nd").alias("bnet"),
        F.min("t").alias("first_t"),
    )
    across = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "bucket",
        "inmax",
        "first_t",
        F.coalesce(F.sum("bnet").over(across), F.lit(0)).alias("carry"),
    )
    # the bare carry-in value is only OBSERVED inside the bucket when
    # the first boundary lands strictly after bucket start (concurrency
    # at bucket_start itself is then the carry); if a departure sits
    # exactly on the boundary, the carry belongs to the previous bucket
    best_in = F.when(
        F.col("first_t") > F.col("bucket"),
        F.greatest(F.lit(0), F.col("inmax")),
    ).otherwise(F.col("inmax"))
    return offsets.select(
        F.col("bucket").cast("long").alias("bucket_start"),
        (F.col("carry") + best_in).cast("long").alias("max_concurrent"),
    )


def asof_join_nearest(events: DataFrame, orders: DataFrame) -> DataFrame:
    """NEAREST-in-time as-of join: for each event, the order of
    customer ``user_id + 1`` with the smallest |orderdate - ts| —
    backward on ties — completing the as-of family (backward
    ``asof_join_last_order``, forward q81, tolerance q48).

    Both direction carries ride ONE union and ONE exchange: the
    backward window carries ``last(order, ignorenulls)`` up to the
    row, the forward window carries ``first(order, ignorenulls)``
    from the row on (order rows sort before events at equal
    timestamps, so a same-instant order is visible to BOTH carries
    with gap zero), and a pure CASE picks the closer side.  Same
    cost envelope as the one-direction form: |events|+|orders|
    through a single partition-sort."""
    u = _tag_orders_events_union(events, orders)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_is_order").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.withColumn(
        "back", F.last("_order_epoch", ignorenulls=True).over(wb)
    ).withColumn("fwd", F.first("_order_epoch", ignorenulls=True).over(wf))
    ev = carried.filter(F.col("_is_order") == 0).select(
        "event_id",
        "user_id",
        F.unix_timestamp("_t").alias("ts_s"),
        "back",
        "fwd",
    )
    bg = F.col("ts_s") - F.col("back")
    fg = F.col("fwd") - F.col("ts_s")
    # a NULL event timestamp has no as-of position: asc nulls-first
    # puts it at the partition head, where back is NULL but the
    # forward carry hands it the user's EARLIEST order — the exact
    # bogus-match class asof_join masks (r5 catch) that this variant
    # missed (r9 review).  Mask first, before the back/fwd cases.
    nearest = (
        F.when(F.col("ts_s").isNull(), F.lit(None).cast("long"))
        .when(F.col("back").isNull(), F.col("fwd"))
        .when(F.col("fwd").isNull(), F.col("back"))
        .when(fg < bg, F.col("fwd"))
        .otherwise(F.col("back"))
    )
    return ev.select(
        "event_id",
        "user_id",
        nearest.cast("long").alias("nearest_order_epoch"),
        F.when(
            nearest.isNotNull(),
            F.abs(F.col("ts_s") - nearest),
        )
        .cast("long")
        .alias("gap_s"),
    )
