"""Hypothesis properties for the session's scale operators: generated
adversarial inputs with shrinking, versus exact brute-force references.
Spark-heavy, so few examples each — the fixed-case tests carry the
volume; these carry the search."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_stream_processing_engine_spark.operators.dedup import (
    basket_similarity,
)
from real_time_stream_processing_engine_spark.operators.windows import (
    interval_concurrency,
)

SET = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=0, max_value=120),
    ).map(lambda t: (t[0], t[0] + t[1])),
    min_size=1,
    max_size=25,
)


@given(iv=intervals)
@settings(**SET)
def test_sweepline_property(spark, iv):
    # brute force on a small universe; bucket width 100 forces
    # boundary-straddling intervals and carry-only buckets
    B = 100
    df = spark.createDataFrame(iv, "start_sec long, end_sec long")
    got = {
        r.bucket_start: r.max_concurrent
        for r in interval_concurrency(df, bucket_sec=B).collect()
    }
    buckets = sorted({(t // B) * B for s, e in iv for t in (s, e + 1)})
    want = {}
    for b in buckets:
        probes = {b} | {
            t for s, e in iv for t in (s, e + 1) if b <= t < b + B
        }
        want[b] = max(
            sum(1 for s, e in iv if s <= t <= e) for t in probes
        )
    assert got == want


baskets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=8),
    ),
    min_size=1,
    max_size=30,
)


@given(items=baskets)
@settings(**SET)
def test_basket_similarity_property(spark, items):
    df = spark.createDataFrame(items, "entity long, item long")
    got = {
        (r.a, r.b): (r.n_common, r.jaccard_ppm)
        for r in basket_similarity(df, min_common=1).collect()
    }
    sets: dict[int, set[int]] = {}
    for e, i in items:
        sets.setdefault(e, set()).add(i)
    want = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a < b:
                inter = len(sets[a] & sets[b])
                if inter >= 1:
                    union = len(sets[a] | sets[b])
                    want[(a, b)] = (inter, inter * 1_000_000 // union)
    assert got == want
