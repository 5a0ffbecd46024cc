"""Range (interval) join — an operator Spark has no native physical
strategy for.

A pure range predicate (``right_ts BETWEEN left_ts + lower AND left_ts
+ upper``) with no equi key gives Catalyst nothing to hash on, so the
naive plan is BroadcastNestedLoopJoin — |left| x |right| comparisons, a
non-starter at scale.  The classic fix is binning: quantize time into
buckets at least as wide as the window span, derive an equi key from
the bucket id, and re-check the exact predicate after the hash join.
Each left row probes at most TWO buckets (the window spans bucket
boundaries at most once when bin width >= span), so cost is linear in
rows + true matches, and the join is an ordinary shuffled/broadcast
hash join that AQE can skew-split.

The reference has no joins at all (SURVEY.md §2.5); this is north-star
surface in the same family as the as-of join (operators/windows.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``right[right_ts]`` falls in
    ``[left[left_ts] + lower_s, left[left_ts] + upper_s]`` (seconds,
    inclusive) — via bucket equi-join + exact re-check.

    Bin width = window span, so the left side explodes to at most two
    probe buckets (deduplicated when they coincide) and the right side
    computes a single bucket id; both are scan-side projections.

    Inner joins only: the post-join exact re-check would silently drop
    the null-extended rows of any outer join (degrading it to inner),
    and the 2-bucket left explode can duplicate unmatched left rows —
    the same soundness trap :func:`..skew.salted_join` rejects.
    """
    if how.replace("_", "").lower() != "inner":
        raise ValueError(
            f"binned_range_join supports how='inner' only, got {how!r}: the "
            "exact-predicate re-check after the bucket join would drop outer "
            "joins' null-extended rows and the probe-bucket explode can "
            "duplicate unmatched left rows"
        )
    span = int(upper_s) - int(lower_s)
    if span <= 0:
        raise ValueError("upper_s must be greater than lower_s")
    if any(c == "_bin" for c in (*left.columns, *right.columns)):
        # withColumn silently REPLACES a same-named column: a real
        # `_bin` would be overwritten by the bucket id and then dropped
        # from the result — the caller loses a column without an error
        # (same reserved-scratch contract as salted_join's _salt and
        # bloom_prefilter's _bp_p*)
        raise ValueError(
            "a `_bin` column on either side collides with "
            "binned_range_join's bucket scratch name — rename it first"
        )
    for df_, c in ((left, left_ts), (right, right_ts)):
        t = df_.schema[c].dataType.typeName()
        if t not in ("timestamp", "timestamp_ntz", "date"):
            # unix_timestamp would cast a numeric epoch to STRING and
            # parse it as a date — an opaque mid-join ANSI error (or
            # all-NULL bins off ANSI).  Name the real problem instead
            # (r5 review catch).
            raise ValueError(
                f"{c!r} must be a timestamp/date column, got {t}; for "
                "epoch numbers convert first (F.timestamp_seconds)"
            )

    def _epoch(df: DataFrame, c: str) -> Column:
        return F.unix_timestamp(df[c]).cast("long")

    le = _epoch(left, left_ts)
    probe_bins = F.array_distinct(
        F.array(
            F.floor((le + F.lit(int(lower_s))) / F.lit(span)),
            F.floor((le + F.lit(int(upper_s))) / F.lit(span)),
        )
    )
    l = left.withColumn("_bin", F.explode(probe_bins))
    r = right.withColumn("_bin", F.floor(_epoch(right, right_ts) / F.lit(span)))
    # qualify via the exploded/binned frames' own column refs so the
    # predicate is unambiguous even when both inputs share the ts name
    re_ = F.unix_timestamp(r[right_ts]).cast("long")
    le_ = F.unix_timestamp(l[left_ts]).cast("long")
    exact = (re_ >= le_ + F.lit(int(lower_s))) & (re_ <= le_ + F.lit(int(upper_s)))
    return l.join(r, on=["_bin"], how="inner").filter(exact).drop("_bin")
