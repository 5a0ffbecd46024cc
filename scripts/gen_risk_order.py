"""Regenerate __spark_entry__._RISK_ORDER as a freshness order.

Usage: python scripts/gen_risk_order.py [--head q67,q69,...] [--write]

With the cumulative driver ledger closed (356/356 in round 9), the
window policy is freshness: --head lists the prefixes that must lead
(rows whose code this round touches, then rows under bench
adjudication); every remaining prefix follows ordered by the round of
its LAST driver check — computed from the CORRECTNESS_r*.json union —
oldest first, numeric order within a round.

Prints the formatted list body; with --write, splices it into
__spark_entry__.py between the `_RISK_ORDER = [` line and its closing
`]` (preserving the comment block at the top of the list, i.e. any
leading lines that start with '#').  Update the comment by hand — it
explains the round's choice of head, which a script cannot know.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def staleness_order(head: list[str]) -> list[str]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            if name.startswith("_"):
                continue
            last[name.split("_", 1)[0]] = rnd
    missing = [p for p in head if p not in last]
    if missing:
        raise SystemExit(f"--head prefixes not in any CORRECTNESS artifact: {missing}")
    rest = sorted(
        (p for p in last if p not in head),
        key=lambda p: (last[p], int(p[1:])),
    )
    return head + rest


def format_body(order: list[str]) -> str:
    lines = []
    for i in range(0, len(order), 8):
        lines.append("    " + ", ".join(f'"{p}"' for p in order[i : i + 8]) + ",")
    return "\n".join(lines)


def main() -> int:
    head: list[str] = []
    write = "--write" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--head":
            head = [p.strip() for p in sys.argv[i + 1].split(",") if p.strip()]
    order = staleness_order(head)
    body = format_body(order)
    if not write:
        print(body)
        return 0
    path = os.path.join(ROOT, "__spark_entry__.py")
    src = open(path).read()
    start = src.index("_RISK_ORDER = [")
    end = src.index("\n]", start)
    block = src[start:end]
    # keep the leading comment lines of the existing list
    kept = ["_RISK_ORDER = ["]
    for line in block.splitlines()[1:]:
        if line.lstrip().startswith("#"):
            kept.append(line)
        else:
            break
    new = "\n".join(kept) + "\n" + body
    open(path, "w").write(src[:start] + new + src[end:])
    # validate: the rewritten module must still register every query
    sys.path.insert(0, ROOT)
    import importlib

    import __spark_entry__ as mod

    importlib.reload(mod)
    q = mod.queries()
    assert len(q) == len(order), (len(q), len(order))
    print(f"wrote {len(order)} prefixes; head: {order[:max(len(head), 6)]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
