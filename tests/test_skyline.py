"""Two-phase grid skyline vs the O(n^2) definition, on adversarial
synthetic data (duplicates, both-dim ties, single-cell collapse)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.windows import skyline_2d


def _brute(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (bx <= x and by >= y and (bx < x or by > y))
            for j, (bx, by) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _run(spark, points, bins=8):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(points)],
        "id: long, x: double, y: double",
    )
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y", n_bins=bins).collect()
    )
    return got


def test_skyline_matches_bruteforce_random(spark):
    rng = random.Random(7)
    for trial in range(4):
        pts = [
            (rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(120)
        ]
        assert _run(spark, pts) == _brute(pts), trial


def test_skyline_exact_ties_survive_together(spark):
    """Exact (x, y) duplicates do not dominate each other: all copies
    stay, and every copy's id comes back."""
    pts = [(1, 9), (1, 9), (2, 9), (0, 0)]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id: long, x: double, y: double",
    )
    rows = skyline_2d(df, "x", "y", n_bins=4).collect()
    ids = sorted(r["id"] for r in rows)
    # (2,9) dominated by (1,9); (0,0)... x=0 lower, y lower: not dominated
    assert ids == [0, 1, 3]


def test_skyline_degenerate_single_value(spark):
    """All rows identical on the minimized column (zero-width grid):
    the width fallback keeps the math finite and the sweep exact."""
    pts = [(5, 1), (5, 3), (5, 3), (5, 2)]
    got = _run(spark, pts, bins=4)
    assert got == [(5.0, 3.0), (5.0, 3.0)]


def test_skyline_ignores_null_coordinates_and_empty_input(spark):
    """r5 review: a NULL minimize value binned into the top cell and
    seeded the running max, deleting genuine frontier rows; empty
    input crashed on the driver."""
    from real_time_stream_processing_engine_spark.operators.windows import skyline_2d

    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 2.0, 10.0), (3, None, 100.0), (4, 3.0, None)],
        "id long, cost double, score double",
    )
    got = {r.id for r in skyline_2d(df, "cost", "score").collect()}
    assert got == {1, 2}  # null rows neither dominate nor appear
    empty = df.filter("id < 0")
    assert skyline_2d(empty, "cost", "score").count() == 0
