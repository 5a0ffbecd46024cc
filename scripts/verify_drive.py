"""Driver-contract verification drive (the /verify recipe, scripted).

Exercises the REAL runtime surface the driver uses — `__spark_entry__`'s
entry/queries/oracle_sql — in a fresh process, side-by-side with DuckDB:

    python scripts/verify_drive.py [--sf DIR] [query ...]

With no query names: runs `entry(spark)` (must yield >0 rows), checks
oracle_sql keys ⊆ queries keys, and drives 3 default queries.  With
names: drives exactly those against their oracles.  Exit 0 iff all ok.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = ["q01_filter_contains", "q13_knn_cosine", "q23_tumbling_window"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from real_time_stream_processing_engine_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    spark = get_spark(
        app_name="rs-verify-drive",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = mod.queries(), mod.oracle_sql()
    bad = sorted(set(osql) - set(qs))
    assert not bad, f"oracle_sql keys missing from queries(): {bad}"

    ok = True
    if not args.queries:
        t0 = time.time()
        n = len(mod.entry(spark).collect())
        print(f"entry(spark): {n} rows in {time.time() - t0:.1f}s")
        ok &= n > 0

    con = duck_connection(args.sf)
    for name in args.queries or DEFAULTS:
        t0 = time.time()
        df = qs[name](spark, args.sf)
        if name in osql:
            r = compare(df, con, osql[name])
            line = (
                f"rows={r['rows_spark']}/{r['rows_oracle']} "
                f"schema={r['schema_match']} hash={r['values_match']}"
            )
            ok &= bool(r["ok"])
        else:
            n = len(df.collect())
            line = f"rows={n} (no oracle)"
            ok &= n >= 0
        print(f"{name}: {line} [{time.time() - t0:.1f}s]")
    print("VERIFY", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
