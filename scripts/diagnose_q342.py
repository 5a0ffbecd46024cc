"""Instrumented paired diagnosis of the q342 bench outlier (r8 verdict
item 2).

PAIRED_r08 saw a sporadic ~13 s mode (vs ~7 s median) fire 3/16 times
on the r8 side and 0/16 on the r7 side, yet `git diff` shows q342's
code path (operators/graph.py adamic_adar_links + queries.py q342) is
byte-identical across the two tips — so the cause is either ambient
(box noise clustering on one side) or environmental-per-repo (e.g.
eventLog/warehouse dir contents).  This script settles it the way the
verdict asks: >= 8 reps per side, alternating fresh subprocesses, and
for EVERY rep it records

- wall time of the q342 count (same timing as bench.py),
- the driver JVM's GC collection-time delta across the timed region
  (local mode: driver == executor, so this IS the executor GC),
- a Spark event log, parsed afterward for the slowest rep of each side
  into per-stage executorRunTime / jvmGcTime / shuffle bytes.

Usage: python scripts/diagnose_q342.py <repo_a> <repo_b> [reps] [query]
Writes one JSON blob to stdout; per-rep lines to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

EVDIR = "/tmp/q342_eventlogs"

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
prefix = sys.argv[2]
evdir = sys.argv[3]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from real_time_stream_processing_engine_spark.queries import QUERIES
from real_time_stream_processing_engine_spark.session import get_spark
spark = get_spark(app_name="diag342", extra_conf={
    "spark.ui.showConsoleProgress": "false",
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": "file:" + evdir,
    "spark.eventLog.rolling.enabled": "false",
    "spark.eventLog.compress": "false",
})
spark.sparkContext.setLogLevel("ERROR")
# bench.py's warmup, verbatim: JVM/codegen + Python worker pool
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr("sum(l_extendedprice)").collect()
spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr("sum(length(text))").collect()
def _noop(b):
    yield from b
n = spark.sparkContext.defaultParallelism
spark.range(n * 4).repartition(n).mapInPandas(_noop, "id long").count()
spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter("contains(lower(text), 'zzzqqx')").count()

def gc_ms():
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    t = c = 0
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime(); c += b.getCollectionCount()
    return t, c

by_prefix = {name.split("_", 1)[0]: name for name in QUERIES}
name = by_prefix[prefix]
g0, c0 = gc_ms()
t0 = time.monotonic()
QUERIES[name](spark, sf_dir).count()
wall = time.monotonic() - t0
g1, c1 = gc_ms()
heap = spark._jvm.java.lang.Runtime.getRuntime()
print("DIAG " + json.dumps({
    "wall": round(wall, 3),
    "gc_ms": g1 - g0, "gc_n": c1 - c0,
    "heap_used_mb": int((heap.totalMemory() - heap.freeMemory()) / 1048576),
    "app_id": spark.sparkContext.applicationId,
}))
spark.stop()
"""


def run_once(repo: str, prefix: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, prefix, EVDIR],
        capture_output=True, text=True, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("DIAG "):
            return json.loads(line[5:])
    raise RuntimeError(f"no result from {repo}: {r.stderr[-2000:]}")


def parse_eventlog(app_id: str) -> dict:
    """Per-stage rollup {stage: {tasks, run_ms, gc_ms, shuffle_read_mb,
    shuffle_write_mb, wall_ms}} from one app's event log."""
    path = os.path.join(EVDIR, app_id)
    stages: dict[str, dict] = {}
    names: dict[int, str] = {}
    submit: dict[int, int] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                names[si["Stage ID"]] = si["Stage Name"].split("\n")[0]
                submit[si["Stage ID"]] = si.get("Submission Time", 0)
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                nm = f"s{sid}:{names.get(sid, '?')[:60]}"
                d = stages.setdefault(
                    nm, {"tasks": 0, "run_ms": 0, "gc_ms": 0,
                         "sh_read_mb": 0.0, "sh_write_mb": 0.0, "wall_ms": 0},
                )
                d["wall_ms"] = si.get("Completion Time", 0) - si.get(
                    "Submission Time", submit.get(sid, 0)
                )
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                nm = f"s{sid}:{names.get(sid, '?')[:60]}"
                m = ev.get("Task Metrics") or {}
                d = stages.setdefault(
                    nm, {"tasks": 0, "run_ms": 0, "gc_ms": 0,
                         "sh_read_mb": 0.0, "sh_write_mb": 0.0, "wall_ms": 0},
                )
                d["tasks"] += 1
                d["run_ms"] += m.get("Executor Run Time", 0)
                d["gc_ms"] += m.get("JVM GC Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                d["sh_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1048576
                d["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1048576
    for d in stages.values():
        d["sh_read_mb"] = round(d["sh_read_mb"], 1)
        d["sh_write_mb"] = round(d["sh_write_mb"], 1)
    return stages


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    prefix = sys.argv[4] if len(sys.argv) > 4 else "q342"
    os.makedirs(EVDIR, exist_ok=True)
    runs: dict[str, list[dict]] = {repo_a: [], repo_b: []}
    for i in range(reps):
        for repo in ((repo_a, repo_b) if i % 2 == 0 else (repo_b, repo_a)):
            d = run_once(repo, prefix)
            runs[repo].append(d)
            print(f"# rep {i} {repo}: {d}", file=sys.stderr)
    out = {"a": repo_a, "b": repo_b, "query": prefix, "reps": reps, "sides": {}}
    for repo, rs in runs.items():
        walls = [r["wall"] for r in rs]
        med = statistics.median(walls)
        outliers = [w for w in walls if w > 1.5 * med]
        out["sides"][repo] = {
            "walls": walls,
            "median": round(med, 3),
            "outliers_gt_1_5x_median": len(outliers),
            "gc_ms": [r["gc_ms"] for r in rs],
            "gc_n": [r["gc_n"] for r in rs],
            "heap_used_mb": [r["heap_used_mb"] for r in rs],
        }
        slow = max(rs, key=lambda r: r["wall"])
        fast = min(rs, key=lambda r: r["wall"])
        out["sides"][repo]["slowest_rep"] = {
            "wall": slow["wall"], "gc_ms": slow["gc_ms"],
            "stages": parse_eventlog(slow["app_id"]),
        }
        out["sides"][repo]["fastest_rep"] = {
            "wall": fast["wall"], "gc_ms": fast["gc_ms"],
            "stages": parse_eventlog(fast["app_id"]),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
