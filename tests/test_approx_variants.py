"""Closeness checks for the approximate (sketch) query variants.

q44/q45 are registered rows-only (an estimate can't hash-match an exact
oracle); these tests pin that the sketches land within their declared
error bounds of the exact q35/q41 answers, so "approximate" never
silently becomes "wrong"."""

from __future__ import annotations

from real_time_stream_processing_engine_spark.queries import QUERIES


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    exact = {r.l_returnflag: r.asDict() for r in QUERIES["q35_percentiles"](spark, sf_dir).collect()}
    approx = {r.l_returnflag: r.asDict() for r in QUERIES["q44_approx_percentiles"](spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        for p in ("p25", "p50", "p75", "p95"):
            # rank error 1e-4 on interpolated percentiles of a smooth-ish
            # price distribution: within 1% relative is comfortably loose
            assert abs(a[p] - e[p]) <= 0.01 * max(abs(e[p]), 1.0), (flag, p, e[p], a[p])


def test_approx_distinct_close_to_exact(spark, sf_dir):
    def key(r):
        return (r["event_type"], r["dow"])

    exact = {key(r): r for r in (x.asDict() for x in QUERIES["q41_cube_distinct"](spark, sf_dir).collect())}
    approx = {key(r): r for r in (x.asDict() for x in QUERIES["q45_approx_distinct"](spark, sf_dir).collect())}
    # the cube lattice itself must be identical — only n_users is estimated
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a = approx[k]
        assert a["n_events"] == e["n_events"]
        assert a["sum_value"] == e["sum_value"]
        assert abs(a["n_users"] - e["n_users"]) <= max(0.05 * e["n_users"], 2), (k, e["n_users"], a["n_users"])
