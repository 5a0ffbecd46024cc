"""Ad-hoc single-query oracle check: python scripts/check_one.py q96 [sf_dir].

Same comparison contract as scripts/local_correctness.py, restricted to
the named query prefixes — the fast inner loop while building a new
queries()/oracle_sql() pair.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    prefixes = [a for a in sys.argv[1:] if not a.startswith("/")]
    dirs = [a for a in sys.argv[1:] if a.startswith("/")]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
    import __spark_entry__ as mod
    from real_time_stream_processing_engine_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    spark = get_spark(
        app_name="rs-check-one",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, osql = mod.queries(), mod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if not any(name.split("_", 1)[0] == p for p in prefixes):
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in osql:
            r = compare(df, con, osql[name])
            ok = r["ok"]
            print(
                f"{name}: ok={ok} rows={r['rows_spark']}/{r['rows_oracle']} "
                f"schema={r['schema_match']} hash={r['values_match']} "
                f"({time.time() - t0:.1f}s)"
            )
            if not ok:
                bad += 1
                print("  spark:", df.columns)
        else:
            n = df.count()
            print(f"{name}: rows-only spark_rows={n} ({time.time() - t0:.1f}s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
