"""Partitioning-determinism sweep: run EVERY registered query twice in
one session — spark.sql.shuffle.partitions=32 then 5 — and compare the
canonicalized result sets.  A mismatch means the result depends on the
physical partitioning (an under-ordered LIMIT, a rank tie broken by
task order, a float aggregate surfacing reassociation past its
rounding) — the class of bug an oracle check at one fixed config can
never see.

Usage: python scripts/determinism_sweep.py [sf_dir] [out_name]
(defaults sf0.01, DETERMINISM_LOCAL.json)
Writes {query: {"match": bool, "rows": [n, n]}} to repo-root/out_name.
Streaming drains re-stage their own sources per run, so they are
compared too; queries that error under either config record the error.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(df):
    """Same tolerance contract as the oracle harness (columns sorted by
    name, floats rounded to 6dp, type-tagged) — reuse it so the sweep
    cannot drift from tests/oracle.py.  Zeros normalize first: repr- or
    str-keyed paths would otherwise split -0.0 from 0.0."""
    from tests.oracle import canonical_rows

    cols = list(df.columns)
    rows = [
        tuple(
            0.0 if (isinstance(v, float) and v == 0.0) else v for v in tuple(row)
        )
        for row in df.collect()
    ]
    return canonical_rows(cols, rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_name = sys.argv[2] if len(sys.argv) > 2 else "DETERMINISM_LOCAL.json"
    import __spark_entry__ as mod
    from real_time_stream_processing_engine_spark.session import get_spark

    spark = get_spark(
        app_name="rs-determinism",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    out: dict[str, dict] = {}
    n_bad = 0
    t0 = time.time()
    for name, fn in qs.items():
        rec: dict = {}
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = _canon(fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            b = _canon(fn(spark, sf_dir))
            rec = {"match": a == b, "rows": [len(a), len(b)]}
        except Exception as e:  # record, keep going
            rec = {"match": False, "err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        out[name] = rec
        if not rec.get("match"):
            n_bad += 1
        print(f"# {name}: {'ok' if rec.get('match') else 'MISMATCH'}", file=sys.stderr)
    meta = {
        "sf_dir": sf_dir,
        "configs": [32, 5],
        "n_queries": len(qs),
        "n_mismatch": n_bad,
        "wall_sec": round(time.time() - t0, 1),
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        out_name,
    )
    with open(dest, "w") as f:
        json.dump({"_meta": meta, **out}, f, indent=2)
    print(json.dumps(meta))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
