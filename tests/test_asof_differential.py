"""Differential property test: asof_join vs pandas merge_asof.

The as-of join is the operator with the most tie/tolerance/direction
edge cases; the DuckDB oracle (q26/q48) pins one fixture, hypothesis
pins the SEMANTICS — the distributed union-sort-carry must agree with
pandas ``merge_asof`` (the de-facto reference implementation) on
arbitrary generated inputs, in both directions, with and without
tolerance.

Tie handling note: at equal right-side timestamps pandas keeps the
LAST row in input order, while asof_join deterministically keeps the
max (ts, value_cols...) struct.  The generator therefore draws unique
right timestamps per key (the oracle fixture covers truncation-made
ties; here the subject is carry/tolerance/direction correctness).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_stream_processing_engine_spark.operators.windows import asof_join

SET = dict(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# epoch seconds in a 1-hour band; small keyspace forces collisions
ts_s = st.integers(min_value=1_700_000_000, max_value=1_700_003_600)
key = st.integers(min_value=0, max_value=2)

left_rows = st.lists(
    st.tuples(key, ts_s), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(key, ts_s, st.integers(min_value=-100, max_value=100)),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts): see module note
)


def _pandas_asof(left, right, direction, tolerance_s):
    lp = pd.DataFrame(left, columns=["k", "t"]).astype("int64")
    lp["row_id"] = range(len(lp))  # BEFORE sorting: ids are input order
    lp = lp.sort_values("t", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "t", "v"]).astype("int64")
    # carry the matched right ts explicitly as a value column
    rp["rt"] = rp["t"]
    rp = rp.sort_values("t", kind="stable")
    out = pd.merge_asof(
        lp,
        rp,
        on="t",
        by="k",
        direction=direction,
        tolerance=None if tolerance_s is None else tolerance_s,
    )
    return {
        int(r.row_id): (
            None if pd.isna(r.rt) else int(r.rt),
            None if pd.isna(r.v) else int(r.v),
        )
        for r in out.itertuples()
    }


def _spark_asof(spark, left, right, direction, tolerance_s):
    lf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k: long, t_s: long, row_id: long"
    ).selectExpr("k", "timestamp_seconds(t_s) AS t", "row_id")
    rf = spark.createDataFrame(
        right or [], "k: long, t_s: long, v: long"
    ).selectExpr("k", "timestamp_seconds(t_s) AS t", "v")
    out = asof_join(
        lf,
        rf,
        on="k",
        left_ts="t",
        right_ts="t",
        value_cols=["v"],
        direction=direction,
        tolerance_s=tolerance_s,
    )
    return {
        int(r["row_id"]): (
            None if r["asof_ts"] is None else int(r["asof_ts"]),
            None if r["asof_v"] is None else int(r["asof_v"]),
        )
        for r in out.collect()
    }


@given(left=left_rows, right=right_rows, tol=st.sampled_from([None, 60, 900]))
@settings(**SET)
def test_backward_asof_matches_pandas(spark, left, right, tol):
    assert _spark_asof(spark, left, right, "backward", tol) == _pandas_asof(
        left, right, "backward", tol
    )


@given(left=left_rows, right=right_rows, tol=st.sampled_from([None, 60, 900]))
@settings(**SET)
def test_forward_asof_matches_pandas(spark, left, right, tol):
    assert _spark_asof(spark, left, right, "forward", tol) == _pandas_asof(
        left, right, "forward", tol
    )
