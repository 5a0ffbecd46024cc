"""Compare two bench artifacts with ambient-anchor normalization.

Usage: python scripts/bench_compare.py BENCH_r09.json BENCH_r10.json

Accepts either a raw bench.py JSON line (one dict with "queries") or a
driver archive ({"tail": "<truncated stdout>", ...}) — per-query times
are regex-extracted from the tail, so the truncation-surviving slowest
queries still compare.  Prints, for the common query set:

- raw sum ratio b/a and the per-query >1.5x flags both ways;
- if BOTH artifacts carry the r10+ ``calib_pre``/``calib_post`` anchor
  fields, the anchor ratio (how much slower b's box was than a's) and
  the anchor-NORMALIZED common-set ratio — the number that survives a
  degraded host (r9's 31.6 s q307 on a 433 s suite would normalize to
  parity; see NOTES_r10 §8 for the anchored demonstration).

The anchor of a run is min(calib_pre, calib_post) per pinned job,
averaged across the two jobs AFTER dividing by the other run's same
job (a ratio of mins): the min is the box's best observed capability
around that suite, so the ratio reads as pure ambient state.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> tuple[dict[str, float], dict | None]:
    """(per-query times, anchor fields or None) from either format."""
    raw = open(path).read().strip()
    doc = json.loads(raw)
    if "tail" in doc and "queries" not in doc:
        tail = doc["tail"]
        q = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q\d+_[a-z0-9_]+)":\s*([\d.-]+)', tail)
        }
        anchors = None
        m = re.search(r'"calib_pre":\s*({[^}]*})', tail)
        m2 = re.search(r'"calib_post":\s*({[^}]*})', tail)
        if m and m2:
            anchors = {
                "calib_pre": json.loads(m.group(1)),
                "calib_post": json.loads(m2.group(1)),
            }
        return {k: v for k, v in q.items() if v > 0}, anchors
    q = {k: v for k, v in doc.get("queries", {}).items() if v > 0}
    # truthiness, not presence: the guarded bench (r11) emits
    # "calib_pre": null when an anchor job failed — that is no anchor
    anchors = (
        {"calib_pre": doc["calib_pre"], "calib_post": doc["calib_post"]}
        if doc.get("calib_pre") and doc.get("calib_post")
        else None
    )
    return q, anchors


def anchor_ratios(a: dict, b: dict) -> tuple[float, float, bool]:
    """(min-based ratio, mean-based ratio, stable) of b's box vs a's.

    min-of-pre/post estimates each box's best capability — right when
    the box state was STABLE across each run; mean-of-pre/post weights
    a transient degradation — right when it wasn't.  ``stable`` is
    False when either run's pre and post anchors diverge >1.5x on any
    job (the box changed state mid-run, so no single scalar normalizes
    that run's per-query times — read its fast/slow halves separately,
    as NOTES_r10 §8 does for the alphabetical split).

    Only jobs present in BOTH runs' pre AND post dicts are compared —
    an artifact whose pinned-job set changed (or was hand-edited) must
    degrade to raw-ratio-only, not raise (r10 advice item 3); with an
    empty intersection the ratios come back None."""
    jobs = sorted(
        set(a["calib_pre"]) & set(a["calib_post"])
        & set(b["calib_pre"]) & set(b["calib_post"])
    )
    mins, means, stable = [], [], True
    for job in jobs:
        ap, apo = a["calib_pre"][job], a["calib_post"][job]
        bp, bpo = b["calib_pre"][job], b["calib_post"][job]
        for hi, lo in ((ap, apo), (bp, bpo)):
            if max(hi, lo) > 1.5 * min(hi, lo):
                stable = False
        mins.append(min(bp, bpo) / min(ap, apo))
        means.append(((bp + bpo) / 2) / ((ap + apo) / 2))
    if not mins:
        return None, None, stable
    n = len(mins)
    return sum(mins) / n, sum(means) / n, stable


def main() -> int:
    pa, pb = sys.argv[1], sys.argv[2]
    qa, aa = load_queries(pa)
    qb, ab = load_queries(pb)
    common = sorted(k for k in qa if k in qb)
    if not common:
        print("no common queries between the two artifacts")
        return 1
    sa, sb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    print(f"common queries: {len(common)} (a has {len(qa)}, b has {len(qb)})")
    print(f"raw common-set sums: a={sa:.1f}s b={sb:.1f}s  b/a={sb / sa:.3f}")
    for r, k in sorted(
        ((qb[k] / qa[k], k) for k in common if qb[k] > 1.5 * qa[k] and qb[k] > 1),
        reverse=True,
    ):
        print(f"  b-spike {r:.2f}x {k}: {qa[k]:.2f} -> {qb[k]:.2f}")
    for r, k in sorted(
        ((qa[k] / qb[k], k) for k in common if qa[k] > 1.5 * qb[k] and qa[k] > 1),
        reverse=True,
    ):
        print(f"  a-spike {r:.2f}x {k}: {qa[k]:.2f} -> {qb[k]:.2f}")
    if aa and ab:
        for side, x in (("a", aa), ("b", ab)):
            print(f"anchors {side}: pre={x['calib_pre']} post={x['calib_post']}")
        r_min, r_mean, stable = anchor_ratios(aa, ab)
        if r_min is None:
            print("anchor job sets share no keys — raw ratio only")
            return 0
        print(f"anchor ratio (b box vs a box): min-based {r_min:.3f}, "
              f"mean-based {r_mean:.3f}")
        print(f"anchor-normalized common-set b/a: min {sb / sa / r_min:.3f}, "
              f"mean {sb / sa / r_mean:.3f}")
        if not stable:
            print("WARNING: a run's pre/post anchors diverge >1.5x — the box "
                  "changed state MID-run; no scalar normalizes it, read that "
                  "run's early vs late queries separately")
    else:
        missing = [p for p, x in ((pa, aa), (pb, ab)) if x is None]
        print(f"no anchors in {missing} — raw ratio only (anchors ship from r10)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
