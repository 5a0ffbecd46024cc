"""One-shot sweep: replace the cross-engine-fragile integerization
``round(x * 100)`` (and ``* 1000000`` / bare ``round(l_quantity)``)
with the single-IEEE-op form ``floor(x * 100 + 0.5)`` on BOTH engine
sides of queries.py, per VERDICT.md r4 item 1 (q232 hash mismatch).

The two forms are numerically identical for the 2-decimal money
columns (x*100 lands within 1 ulp of an integer, never near a half),
but ``floor`` + one IEEE add is bit-identical across Spark and DuckDB
whereas ``round(DOUBLE)`` has engine-/platform-specific tie handling.

Skips: 2-arg rounds (display rounding, has a top-level comma),
Python builtin rounds (no qualifying multiplier suffix).
"""
import re
import sys

PATH = "real_time_stream_processing_engine_spark/queries.py"

MULT_RE = re.compile(r"\*\s*(100|1000000|1_000_000)\s*$")
QTY_PY = re.compile(r'^F\.col\(\s*"l_quantity"\s*\)$')
QTY_SQL = re.compile(r"^(l\.)?l_quantity$")


def find_one(src):
    """Return (start, end, replacement) for the first qualifying round() call."""
    for m in re.finditer(r"(F\.)?round\(", src):
        is_py = m.group(1) is not None
        # balanced-paren scan for the matching close
        depth, i = 1, m.end()
        top_comma = False
        while depth and i < len(src):
            c = src[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = True
            i += 1
        if depth:  # unbalanced (shouldn't happen)
            continue
        inner = src[m.end() : i - 1].strip()
        if top_comma:
            continue  # 2-arg display round — out of scope
        if MULT_RE.search(inner):
            pass  # qualifying integerization
        elif is_py and QTY_PY.match(inner):
            pass
        elif not is_py and QTY_SQL.match(inner):
            pass
        else:
            continue
        if is_py:
            repl = f"F.floor({src[m.end():i-1].rstrip()} + F.lit(0.5))"
        else:
            repl = f"floor({src[m.end():i-1].rstrip()} + 0.5)"
        return m.start(), i, repl
    return None


def main():
    with open(PATH) as f:
        src = f.read()
    n = 0
    while True:
        hit = find_one(src)
        if hit is None:
            break
        s, e, repl = hit
        src = src[:s] + repl + src[e:]
        n += 1
        if n > 1000:
            sys.exit("runaway loop — aborting")
    with open(PATH, "w") as f:
        f.write(src)
    print(f"rewrote {n} sites")


if __name__ == "__main__":
    main()
