"""Differential property test: sessionize vs a pure-Python reference.

Gap-based sessionization has the same edge-case profile as the as-of
join (ties, exact-gap boundaries, single-event sessions); the oracle
pins one fixture, hypothesis pins the semantics against an obviously-
correct sequential implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_stream_processing_engine_spark.operators.windows import sessionize

SET = dict(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# seconds in a small band so gaps straddle the boundary; duplicate
# timestamps per user exercise the (ts, event_id) tie-break
rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # user
        st.integers(min_value=0, max_value=4000),     # ts seconds
    ),
    min_size=1,
    max_size=20,
)
gaps = st.sampled_from([1, 600, 1800])


def _ref_sessions(events, gap_sec):
    """Sequential reference: per user, sort by (ts, event_id), split
    when the delta STRICTLY exceeds the gap."""
    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, (u, t) in enumerate(events):
        by_user.setdefault(u, []).append((t * 1_000_000, eid))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        sessions: list[list[int]] = []
        last = None
        for t_us, _ in evs:
            if last is None or t_us - last > gap_sec * 1_000_000:
                sessions.append([])
            sessions[-1].append(t_us)
            last = t_us
        for sid, ts_list in enumerate(sessions, start=1):
            out.add((u, sid, len(ts_list), ts_list[0], ts_list[-1] - ts_list[0]))
    return out


@given(events=rows, gap=gaps)
@settings(**SET)
def test_sessionize_matches_sequential_reference(spark, events, gap):
    df = spark.createDataFrame(
        [(u, t, eid) for eid, (u, t) in enumerate(events)],
        "user_id: long, t_s: long, event_id: long",
    ).selectExpr("user_id", "timestamp_seconds(t_s) AS ts", "event_id")
    got = {
        (r["user_id"], r["session_id"], r["n_events"], r["session_start_us"], r["duration_us"])
        for r in sessionize(df, gap_sec=gap).collect()
    }
    assert got == _ref_sessions(events, gap)


# ---------------------------------------------------------------------------
# rolling RANGE-frame window (q66) vs an O(n^2) sequential reference
# ---------------------------------------------------------------------------

rolling_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=7200),   # sec
        st.integers(min_value=-5, max_value=5),     # value (int -> exact sums)
    ),
    min_size=1,
    max_size=16,
)


def _ref_rolling(events, width_s):
    """For each event: count/sum over the same user's events with
    sec in [sec - width, sec] — ALL ties included, regardless of row
    order (RANGE frame semantics, not ROWS)."""
    out = {}
    for eid, (u, s, v) in enumerate(events):
        n = tot = 0
        for u2, s2, v2 in events:
            if u2 == u and s - width_s <= s2 <= s:
                n += 1
                tot += v2
        out[eid] = (n, tot)
    return out


@given(events=rolling_rows)
@settings(**SET)
def test_rolling_range_frame_matches_reference(spark, events):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(eid, u, s, v) for eid, (u, s, v) in enumerate(events)],
        "event_id: long, user_id: long, sec: long, value: long",
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, Window.currentRow)
    got = {
        r["event_id"]: (r["n"], r["s"])
        for r in df.select(
            "event_id",
            F.count("*").over(w).alias("n"),
            F.sum("value").over(w).alias("s"),
        ).collect()
    }
    assert got == _ref_rolling(events, 3600)
