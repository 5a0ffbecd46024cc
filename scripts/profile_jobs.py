"""Per-job/stage wall-time profile for one or more queries, via the
Spark event log.

Usage: python scripts/profile_jobs.py q114 [q56 ...] [--sf DIR]

Runs each query once (bench action: count()) in a session with
eventLog enabled, then parses the event log and prints, per job:
submission->completion wall, total task time, and the job description.
Fixed overheads (planning gaps between jobs) show up as the difference
between the sum of job walls and the query wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prefixes = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            prefixes.append(args[i]); i += 1

    evdir = "/tmp/opt/eventlog"
    os.makedirs(evdir, exist_ok=True)
    from real_time_stream_processing_engine_spark.queries import QUERIES
    from real_time_stream_processing_engine_spark.session import get_spark

    spark = get_spark(
        app_name="rs-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # minimal warmup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
        "sum(l_extendedprice)").collect()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr(
        "sum(length(text))").collect()

    names = []
    for p in prefixes:
        ms = [n for n in sorted(QUERIES) if n == p or n.split("_", 1)[0] == p]
        names.extend(ms)

    marks = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"Q::{name}")
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.count()
        marks[name] = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse event log (Spark 4 rolling layout: eventlog_v2_<appid>/events_*)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [f for f in os.listdir(evdir) if app_id in f]
        path = os.path.join(evdir, cands[0])
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]
    jobs = {}
    stage_task_time = {}
    stage_names = {}
    import itertools
    with open(parts[0]) as _f0:
        lines = list(_f0)
    for p in parts[1:]:
        with open(p) as _f:
            lines.extend(_f)
    if True:
        for line in lines:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                jobs[jid] = {
                    "start": e["Submission Time"],
                    "desc": e.get("Properties", {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                }
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                stage_names[sid] = si.get("Stage Name", "")
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    stage_task_time[sid] = (comp - sub) / 1000.0

    for name in names:
        tag = f"Q::{name}"
        qjobs = [j for j in jobs.values() if j["desc"] == tag and "end" in j]
        qjobs.sort(key=lambda j: j["start"])
        tot = sum((j["end"] - j["start"]) / 1000.0 for j in qjobs)
        print(f"\n=== {name}: wall={marks[name]:.2f}s  jobs={len(qjobs)} "
              f"job-wall-sum={tot:.2f}s  gap={marks[name]-tot:.2f}s")
        for j in qjobs:
            w = (j["end"] - j["start"]) / 1000.0
            stgs = [
                f"s{sid}:{stage_task_time.get(sid, 0):.2f}s"
                for sid in j["stages"] if sid in stage_task_time
            ]
            print(f"  job {w:6.2f}s  stages[{' '.join(stgs)}]")
            for sid in j["stages"]:
                if stage_task_time.get(sid, 0) > 1.0:
                    print(f"      s{sid}: {stage_names.get(sid,'')[:140]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
