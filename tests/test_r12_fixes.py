"""Round-12 fixes (r11 VERDICT item 2 + the four r11 ADVICE lows).

1. bench.py re-runs the pinned calib jobs every ZONE_SIZE queries
   (``calib_mid`` + ``zone_bounds`` in the JSON line), so a mid-run
   box-state change localizes to one zone instead of poisoning the
   whole run's normalization.
2. scripts/bench_compare.py grows per-zone machinery: zone_of /
   zone_factors / zone_normalized_sum / best_anchor_ratio, and prints
   a zone-normalized common-set ratio when both artifacts carry mids.
3. anchor_ratios checks pre/post divergence per run over that run's
   OWN job set (advice item 1: a job absent from the other artifact
   must still flag its own run), intersecting only for the ratios.
4. bench._anchor emits exactly ONE stderr line, failures folded in
   (advice item 3).
5. gen_risk_order validates the regenerated module BEFORE writing
   (advice item 2) and gives a usage error, not IndexError, for a
   flag with no value (advice item 4).
"""

from __future__ import annotations

import io
import json
import sys

import pytest

sys.path.insert(0, "scripts")


# ---------------------------------------------------------------- bench.py


def test_zone_bounds_divides_suite_into_zones():
    import bench

    names = [f"q{i:03d}_x" for i in range(356)]
    bounds = bench.zone_bounds(names, zone=60)
    # 356 names / 60 → bounds close zones 1..5; the 56-name final zone
    # is closed by calib_post, not a mid anchor
    assert bounds == [names[59], names[119], names[179], names[239], names[299]]


def test_zone_bounds_no_mid_anchor_for_single_zone():
    import bench

    # ≤ one zone of names: pre/post already bracket everything
    assert bench.zone_bounds([f"q{i}_a" for i in range(60)], zone=60) == []
    assert bench.zone_bounds(["q1_a"], zone=60) == []


def test_zone_bounds_exact_multiple_has_no_trailing_empty_zone():
    import bench

    names = [f"q{i:03d}_x" for i in range(120)]
    # a bound at the very last name would create an empty final zone
    # whose mid anchor duplicates calib_post
    assert bench.zone_bounds(names, zone=60) == [names[59]]


class _BoomSpark:
    @property
    def read(self):
        raise RuntimeError("table gone")


def test_anchor_single_stderr_line_on_failure(capsys):
    # r11 advice item 3: the calibrate failure used to print its own
    # line PLUS the summary — the comparator's tail-parsing docs
    # describe one line per anchor
    import bench

    calib, load = bench._anchor(_BoomSpark(), "/nonexistent", "t")
    assert calib is None
    err_lines = [
        ln for ln in capsys.readouterr().err.splitlines() if ln.strip()
    ]
    assert len(err_lines) == 1
    assert "calib_t" in err_lines[0] and "table gone" in err_lines[0]


def test_anchor_single_line_covers_loadavg_failure_too(capsys, monkeypatch):
    import os

    import bench

    monkeypatch.setattr(
        os, "getloadavg", lambda: (_ for _ in ()).throw(OSError("nope"))
    )
    calib, load = bench._anchor(_BoomSpark(), "/nonexistent", "t")
    assert calib is None and load is None
    err_lines = [
        ln for ln in capsys.readouterr().err.splitlines() if ln.strip()
    ]
    assert len(err_lines) == 1
    assert "table gone" in err_lines[0] and "nope" in err_lines[0]


# ------------------------------------------------------- bench_compare.py


def _anchors(pre, post, mids=None, bounds=None):
    a = {"calib_pre": pre, "calib_post": post}
    if mids is not None:
        a["calib_mid"] = mids
        a["zone_bounds"] = bounds
    return a


def test_anchor_ratios_divergence_checked_on_own_job_set():
    # r11 advice item 1: run b's own job "solo" diverges 4x pre/post
    # but is absent from run a — the old intersect-first code reported
    # stable=True and normalized a mid-run-degraded box
    import bench_compare as bc

    a = _anchors({"j": 0.3}, {"j": 0.3})
    b = _anchors({"j": 0.6, "solo": 0.1}, {"j": 0.6, "solo": 0.4})
    r_min, r_mean, stable = bc.anchor_ratios(a, b)
    assert r_min == pytest.approx(2.0)
    assert not stable


def test_zone_of_assigns_by_execution_order():
    import bench_compare as bc

    bounds = ["q100_m", "q200_t"]
    assert bc.zone_of("q050_a", bounds) == 0
    assert bc.zone_of("q100_m", bounds) == 0  # bound is LAST of its zone
    assert bc.zone_of("q150_b", bounds) == 1
    assert bc.zone_of("q200_t", bounds) == 1
    assert bc.zone_of("q300_z", bounds) == 2


def test_zone_factors_localize_a_mid_run_degradation():
    import bench_compare as bc

    # box degrades 2x DURING zone 1 and stays degraded — the r10/r11
    # driver-bench shape that defeated the single pre/post scalar
    anch = _anchors(
        {"j": 0.2},
        {"j": 0.4},
        mids=[{"j": 0.2}, {"j": 0.4}],
        bounds=["q060_a", "q120_b"],
    )
    zf = bc.zone_factors(anch)
    assert len(zf) == 3
    f0, s0 = zf[0]
    f1, s1 = zf[1]
    f2, s2 = zf[2]
    assert f0 == pytest.approx(1.0) and s0
    # zone 1's bracket diverges 2x → the state change localizes HERE
    assert not s1
    # zone 2 ran wholly in the degraded state: stable bracket, 2x factor
    assert f2 == pytest.approx(2.0) and s2


def test_zone_factors_none_without_mids_or_shared_jobs():
    import bench_compare as bc

    assert bc.zone_factors(_anchors({"j": 0.2}, {"j": 0.2})) is None
    assert (
        bc.zone_factors(
            _anchors({"x": 0.2}, {"x": 0.2}, mids=[{"y": 0.2}], bounds=["q1_a"])
        )
        is None
    )


def test_zone_normalized_sum_strips_a_degraded_zone():
    import bench_compare as bc

    # zone 1 ran 2x degraded (both brackets at 0.4 vs best 0.2): its
    # queries' times halve under normalization; zone 0 unchanged
    anch = _anchors(
        {"j": 0.2},
        {"j": 0.4},
        mids=[{"j": 0.4}],
        bounds=["q060_a"],
    )
    q = {"q010_x": 1.0, "q070_y": 2.0}
    total = bc.zone_normalized_sum(q, sorted(q), anch)
    assert total == pytest.approx(1.0 + 1.0)


def test_best_anchor_ratio_uses_full_sequence():
    import bench_compare as bc

    # b's best reading is in a MID anchor (0.3), not pre/post (0.6) —
    # the ratio must see it
    a = _anchors({"j": 0.2}, {"j": 0.2}, mids=[{"j": 0.2}], bounds=["q1_a"])
    b = _anchors({"j": 0.6}, {"j": 0.6}, mids=[{"j": 0.3}], bounds=["q1_a"])
    assert bc.best_anchor_ratio(a, b) == pytest.approx(1.5)


def test_load_queries_attaches_complete_mid_set_only(tmp_path):
    import bench_compare as bc

    base = {
        "queries": {"q1_a": 1.0},
        "calib_pre": {"j": 0.2},
        "calib_post": {"j": 0.2},
    }
    ok = dict(base, calib_mid=[{"j": 0.2}], zone_bounds=["q1_a"])
    holed = dict(base, calib_mid=[None], zone_bounds=["q1_a"])
    p1, p2 = tmp_path / "ok.json", tmp_path / "holed.json"
    p1.write_text(json.dumps(ok))
    p2.write_text(json.dumps(holed))
    _, a1 = bc.load_queries(str(p1))
    _, a2 = bc.load_queries(str(p2))
    assert "calib_mid" in a1
    # a failed mid anchor → zone structure unknowable → pre/post only
    assert a2 is not None and "calib_mid" not in a2


def test_load_queries_extracts_mids_from_truncated_tail(tmp_path):
    import bench_compare as bc

    tail = (
        '"q1_a": 1.5, "q2_b": 2.0}, "calib_pre": {"j": 0.2}, '
        '"calib_post": {"j": 0.2}, "calib_mid": [{"j": 0.25}], '
        '"zone_bounds": ["q1_a"], "value": 3.5}'
    )
    p = tmp_path / "arch.json"
    p.write_text(json.dumps({"tail": tail}))
    q, anchors = bc.load_queries(str(p))
    assert q == {"q1_a": 1.5, "q2_b": 2.0}
    assert anchors["calib_mid"] == [{"j": 0.25}]
    assert anchors["zone_bounds"] == ["q1_a"]


# ------------------------------------------------------ gen_risk_order.py


def test_gen_risk_order_flag_without_value_is_usage_error():
    import gen_risk_order as g

    with pytest.raises(SystemExit) as e:
        g._flag_value(["prog", "--rounds"], 1, "--rounds")
    assert "usage" in str(e.value)


def test_gen_risk_order_write_validates_before_touching_disk(
    tmp_path, monkeypatch
):
    # r11 advice item 2: a regenerated module that fails validation
    # must leave __spark_entry__.py byte-identical on disk
    import gen_risk_order as g

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q1_a": {}, "q2_b": {}})
    )
    # a stand-in entry module whose queries() registers THREE names —
    # the 2-name regenerated order can never validate against it
    original = (
        "_RISK_ORDER_HEAD: list[str] = []\n"
        "_RISK_ORDER_SOURCE_ROUNDS = (1, 1)\n"
        "_RISK_ORDER = [\n"
        '    "q1", "q2",\n'
        "]\n"
        "def queries():\n"
        "    return {'q1_a': 1, 'q2_b': 2, 'q3_c': 3}\n"
    )
    entry = tmp_path / "__spark_entry__.py"
    entry.write_text(original)
    monkeypatch.setattr(g, "ROOT", str(tmp_path))
    monkeypatch.setattr(
        sys, "argv", ["gen_risk_order.py", "--rounds", "1-1", "--write"]
    )
    # main() inserts ROOT into sys.path for validation; undo it so
    # later tests don't import the stand-in entry module from tmp
    monkeypatch.setattr(sys, "path", list(sys.path))
    with pytest.raises(AssertionError):
        g.main()
    assert entry.read_text() == original
