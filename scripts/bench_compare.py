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

r12+: when BOTH artifacts also carry a complete ``calib_mid`` /
``zone_bounds`` set (bench.py re-anchors every ZONE_SIZE queries), a
zone-NORMALIZED ratio is printed — each query's time divided by its
own zone's degradation factor, then the cross-box best-anchor ratio —
which survives the mid-run state change that defeats the single
scalar (the r10/r11 driver benches both tripped that warning).
"""

from __future__ import annotations

import json
import re
import sys


def _attach_mids(anchors: dict | None, mids, bounds) -> dict | None:
    """Fold r12+ mid-suite anchor fields into the anchors dict when
    they are usable: every mid non-null and exactly one more zone than
    bounds.  A run with a failed mid anchor degrades to pre/post-only
    (the zone structure around the hole is unknowable)."""
    if anchors is None or not mids or not bounds:
        return anchors
    if any(m is None for m in mids) or len(mids) != len(bounds):
        return anchors
    return {**anchors, "calib_mid": mids, "zone_bounds": bounds}


def load_queries(path: str) -> tuple[dict[str, float], dict | None]:
    """(per-query times, anchor fields or None) from either format.

    The anchors dict carries ``calib_pre``/``calib_post`` and, when the
    artifact is from the r12+ bench with a complete mid-anchor set,
    ``calib_mid`` (list of per-zone anchors) + ``zone_bounds`` (last
    query name of each zone, in suite execution order)."""
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
        mids = bounds = None
        m3 = re.search(r'"calib_mid":\s*(\[[^\]]*\])', tail)
        m4 = re.search(r'"zone_bounds":\s*(\[[^\]]*\])', tail)
        if m3 and m4:
            mids, bounds = json.loads(m3.group(1)), json.loads(m4.group(1))
        return {k: v for k, v in q.items() if v > 0}, _attach_mids(
            anchors, mids, bounds
        )
    q = {k: v for k, v in doc.get("queries", {}).items() if v > 0}
    # truthiness, not presence: the guarded bench (r11) emits
    # "calib_pre": null when an anchor job failed — that is no anchor
    anchors = (
        {"calib_pre": doc["calib_pre"], "calib_post": doc["calib_post"]}
        if doc.get("calib_pre") and doc.get("calib_post")
        else None
    )
    return q, _attach_mids(anchors, doc.get("calib_mid"), doc.get("zone_bounds"))


def anchor_ratios(a: dict, b: dict) -> tuple[float, float, bool]:
    """(min-based ratio, mean-based ratio, stable) of b's box vs a's.

    min-of-pre/post estimates each box's best capability — right when
    the box state was STABLE across each run; mean-of-pre/post weights
    a transient degradation — right when it wasn't.  ``stable`` is
    False when either run's pre and post anchors diverge >1.5x on any
    job IN THAT RUN'S OWN job set — divergence is a per-run property,
    so it is checked before intersecting across runs (r11 advice item
    1: a job absent from the other artifact must still be able to flag
    its own run as mid-run-degraded).  The box changed state mid-run →
    no single scalar normalizes that run's per-query times; read its
    zones separately (zone_factors, r12) or its fast/slow halves as
    NOTES_r10 §8 does for the alphabetical split.

    The RATIOS use only jobs present in BOTH runs' pre AND post dicts
    — an artifact whose pinned-job set changed (or was hand-edited)
    must degrade to raw-ratio-only, not raise (r10 advice item 3);
    with an empty intersection the ratios come back None."""
    stable = True
    for side in (a, b):
        for job in set(side["calib_pre"]) & set(side["calib_post"]):
            hi, lo = side["calib_pre"][job], side["calib_post"][job]
            if max(hi, lo) > 1.5 * min(hi, lo):
                stable = False
    jobs = sorted(
        set(a["calib_pre"]) & set(a["calib_post"])
        & set(b["calib_pre"]) & set(b["calib_post"])
    )
    mins, means = [], []
    for job in jobs:
        ap, apo = a["calib_pre"][job], a["calib_post"][job]
        bp, bpo = b["calib_pre"][job], b["calib_post"][job]
        mins.append(min(bp, bpo) / min(ap, apo))
        means.append(((bp + bpo) / 2) / ((ap + apo) / 2))
    if not mins:
        return None, None, stable
    n = len(mins)
    return sum(mins) / n, sum(means) / n, stable


def zone_factors(anchors: dict) -> list[tuple[float, bool]] | None:
    """Per-zone (degradation factor, stable) for one r12+ run.

    The run's anchor sequence is [calib_pre, *calib_mid, calib_post];
    zone k is bracketed by anchors k and k+1.  Per zone, each pinned
    job's local capability is the min of its two bracketing readings;
    the factor is the mean over jobs of local/best, where best is the
    job's min across ALL the run's anchors — so a factor of 1.0 means
    "this zone ran at the box's best observed state" and 2.0 means
    "twice degraded".  ``stable`` is True when the zone's bracketing
    anchors agree within 1.5x on every job — a mid-run state change
    now localizes to the one zone whose bracket disagrees (r11 verdict
    item 2) instead of poisoning the whole run.  None when the run
    carries no usable mid anchors or the jobs share no keys."""
    if "calib_mid" not in anchors:
        return None
    seq = [anchors["calib_pre"], *anchors["calib_mid"], anchors["calib_post"]]
    jobs = set(seq[0])
    for s in seq[1:]:
        jobs &= set(s)
    if not jobs:
        return None
    best = {j: min(s[j] for s in seq) for j in jobs}
    out = []
    for k in range(len(seq) - 1):
        lo_hi = [(min(seq[k][j], seq[k + 1][j]), max(seq[k][j], seq[k + 1][j]))
                 for j in sorted(jobs)]
        factor = sum(
            lo / best[j] for (lo, _), j in zip(lo_hi, sorted(jobs))
        ) / len(jobs)
        stable = all(hi <= 1.5 * lo for lo, hi in lo_hi)
        out.append((factor, stable))
    return out


def zone_of(name: str, bounds: list[str]) -> int:
    """Zone index of a query in a run whose mid anchors fired after
    the ``bounds`` names.  Queries execute in sorted-name order and
    each bound is the LAST name in its zone, so the zone is the count
    of bounds lexicographically below the name."""
    return sum(1 for b in bounds if b < name)


def zone_normalized_sum(q: dict[str, float], names: list[str],
                        anchors: dict) -> float | None:
    """Sum over ``names`` of each query's time divided by its zone's
    degradation factor — the run's common-set cost restated at the
    box's best observed state.  None when the run has no usable zones."""
    zf = zone_factors(anchors)
    if zf is None:
        return None
    bounds = anchors["zone_bounds"]
    return sum(q[n] / zf[min(zone_of(n, bounds), len(zf) - 1)][0] for n in names)


def best_anchor_ratio(a: dict, b: dict) -> float | None:
    """Mean over shared jobs of b's best anchor / a's best anchor,
    best taken across each run's FULL anchor sequence (mids included)
    — the cross-box capability ratio that pairs with zone-normalized
    sums, which are already stated at each box's own best state."""
    def seq(x: dict) -> list[dict]:
        return [x["calib_pre"], *x.get("calib_mid", []), x["calib_post"]]

    sa, sb = seq(a), seq(b)
    jobs = set(sa[0])
    for s in sa[1:] + sb:
        jobs &= set(s)
    if not jobs:
        return None
    return sum(
        min(s[j] for s in sb) / min(s[j] for s in sa) for j in jobs
    ) / len(jobs)


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
            zf = zone_factors(x)
            if zf is not None:
                marks = " ".join(
                    f"z{k}={f:.2f}{'' if st else '!'}"
                    for k, (f, st) in enumerate(zf)
                )
                print(f"  zones {side} (factor vs own best; '!' = bracket "
                      f"diverges >1.5x): {marks}")
        r_min, r_mean, stable = anchor_ratios(aa, ab)
        if r_min is None:
            print("anchor job sets share no keys — raw ratio only")
            return 0
        print(f"anchor ratio (b box vs a box): min-based {r_min:.3f}, "
              f"mean-based {r_mean:.3f}")
        print(f"anchor-normalized common-set b/a: min {sb / sa / r_min:.3f}, "
              f"mean {sb / sa / r_mean:.3f}")
        # zone-normalized ratio (r12): each query divided by its own
        # zone's degradation factor strips intra-run state changes,
        # then the best-anchor ratio strips the cross-box difference —
        # survives exactly the mid-run divergence that defeats the
        # scalar above
        na = zone_normalized_sum(qa, common, aa)
        nb = zone_normalized_sum(qb, common, ab)
        if na is not None and nb is not None:
            rb = best_anchor_ratio(aa, ab)
            if rb is not None:
                print(f"zone-normalized common-set b/a: {nb / na / rb:.3f} "
                      f"(best-anchor box ratio {rb:.3f})")
        if not stable:
            both_zoned = na is not None and nb is not None
            print("WARNING: a run's pre/post anchors diverge >1.5x — the box "
                  "changed state MID-run; "
                  + ("the zone-normalized ratio above localizes it — read "
                     "the '!' zones separately"
                     if both_zoned else
                     "no scalar normalizes it, read that run's early vs "
                     "late queries separately"))
    else:
        missing = [p for p, x in ((pa, aa), (pb, ab)) if x is None]
        print(f"no anchors in {missing} — raw ratio only (anchors ship from r10)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
