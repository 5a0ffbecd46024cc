"""Isolated per-query measurement + plan capture for optimization rounds.

Usage:
    python scripts/isolate.py q127 q341 ... [--reps 3] [--sf /root/testdata/sf0.1]
        [--plans plans/r12 --suffix before] [--noop]

For every named query prefix:
  - rebuilds the DataFrame fresh per rep (same as bench.py) and times
    the bench action (``count()``; ``--noop`` times a noop-sink write
    instead, guide §1.4) — prints min/median of the reps;
  - with ``--plans DIR --suffix S`` writes ``DIR/<name>_S.txt`` with
    ``explain("formatted")`` output.

Session/warmup mirror bench.py so numbers are comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = None
    suffix = "before"
    use_noop = False
    prefixes = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        else:
            prefixes.append(a); i += 1

    from real_time_stream_processing_engine_spark.queries import QUERIES
    from real_time_stream_processing_engine_spark.session import get_spark

    spark = get_spark(
        app_name="rs-isolate",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py warmup, abbreviated: column decode + python worker pool
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
        "sum(l_extendedprice)").collect()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr(
        "sum(length(text))").collect()

    def _noop(batches):
        yield from batches

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        _noop, "id long").count()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        "contains(lower(text), 'zzzqqx')").count()

    names = []
    for p in prefixes:
        ms = [n for n in sorted(QUERIES) if n == p or n.split("_", 1)[0] == p]
        if not ms:
            print(f"no query matches {p!r}", file=sys.stderr)
            return 2
        names.extend(ms)

    for name in names:
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            df = QUERIES[name](spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
        times_r = [round(t, 3) for t in times]
        print(f"{name}: min={min(times_r)} med={round(statistics.median(times), 3)} all={times_r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
