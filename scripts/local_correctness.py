"""Run EVERY registered query against its DuckDB oracle and write
CORRECTNESS_LOCAL.json — the committed artifact covering queries the
driver's bounded window may not reach.

Usage: python scripts/local_correctness.py [sf_dir] [out_name]
(defaults sf0.01, CORRECTNESS_LOCAL.json — pass
CORRECTNESS_LOCAL_SF01.json for the sf0.1 artifact)
Same comparison contract as the driver (tests/oracle.py): row count,
column-name set, order-insensitive value hash with floats rounded to
6 decimals.  Rows-only queries (no oracle) record spark_rows only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_name = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_LOCAL.json"
    import __spark_entry__ as mod
    from real_time_stream_processing_engine_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    spark = get_spark(
        app_name="rs-local-correctness",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, osql = mod.queries(), mod.oracle_sql()
    out: dict[str, dict] = {}
    n_ok = n_bad = 0
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            if name in osql:
                r = compare(df, con, osql[name])
                rec = {
                    "rows_match": r["rows_match"],
                    "schema_match": r["schema_match"],
                    "hash_match": r["values_match"],
                    "spark_rows": r["rows_spark"],
                    "oracle_rows": r["rows_oracle"],
                    "err": None,
                }
                ok = r["ok"]
            else:
                n = len(df.collect())
                rec = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": n,
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
                ok = n >= 0
        except Exception as e:  # record, keep going
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:300],
            }
            ok = False
        out[name] = rec
        n_ok += ok
        n_bad += not ok
        print(f"# {name}: {'ok' if ok else 'FAIL'}", file=sys.stderr)
    meta = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_ok": n_ok,
        "n_fail": n_bad,
        "wall_sec": round(time.time() - t0, 1),
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), out_name)
    with open(dest, "w") as f:
        json.dump({"_meta": meta, **out}, f, indent=2)
    print(json.dumps(meta))
    spark.stop()
    # keep the generated claims table in lockstep with this artifact
    import subprocess

    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "gen_registry.py")],
        check=False,
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
