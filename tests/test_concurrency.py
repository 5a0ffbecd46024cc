"""interval_concurrency: distributed two-phase sweep-line vs a
brute-force per-second evaluation on adversarial interval sets."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators.windows import (
    interval_concurrency,
)


def brute_force(intervals, bucket_sec):
    # concurrency evaluated at every boundary second of every bucket
    # that holds at least one boundary (matching the operator's
    # "buckets with boundaries" output contract)
    buckets = sorted(
        {(t // bucket_sec) * bucket_sec for s, e in intervals for t in (s, e + 1)}
    )
    out = {}
    for b in buckets:
        best = 0
        probe = {b}  # bucket start = carry-in concurrency
        for s, e in intervals:
            for t in (s, e + 1):
                if b <= t < b + bucket_sec:
                    probe.add(t)
        for t in probe:
            best = max(best, sum(1 for s, e in intervals if s <= t <= e))
        out[b] = best
    return out


CASES = [
    # overlap chains, exact-touch, containment, departures-first bucket
    [(0, 10), (5, 20), (15, 30)],
    [(0, 3599), (3600, 7199)],
    [(0, 10000), (100, 200), (150, 250), (9000, 9100)],
    [(0, 100), (0, 100), (0, 100)],
    [(3550, 3650), (3500, 3700), (7300, 7400)],
    [(0, 50)],
]


@pytest.mark.parametrize("case", CASES)
def test_matches_brute_force(spark, case):
    df = spark.createDataFrame(
        [(s, e) for s, e in case], "start_sec long, end_sec long"
    )
    got = {
        r.bucket_start: r.max_concurrent
        for r in interval_concurrency(df, bucket_sec=3600).collect()
    }
    assert got == brute_force(case, 3600)


def test_random_intervals(spark):
    import random

    rng = random.Random(7)
    case = [
        (s, s + rng.randrange(1, 5000))
        for s in (rng.randrange(0, 20000) for _ in range(60))
    ]
    df = spark.createDataFrame(case, "start_sec long, end_sec long")
    got = {
        r.bucket_start: r.max_concurrent
        for r in interval_concurrency(df, bucket_sec=3600).collect()
    }
    assert got == brute_force(case, 3600)
