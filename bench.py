"""Benchmark runner.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line whose KEY ORDER is chosen for tail truncation (consumers
keep only the last ~2 KB of stdout): ``{"metric": ...,
"queries": {name: sec, ... ascending by cost, failures (-1) last},
"families": {family: total_sec}, "family_counts": {...},
"slowest10": {...}, "failed": [names], "calib_pre"/"calib_post":
{pinned-job min-of-3 anchors}, "calib_mid": [one anchor per
ZONE_SIZE queries], "zone_bounds": [last query name of each zone],
"loadavg_pre"/"loadavg_post": [...],
"n_queries": N, "n_failed": N, "sf": ..., "unit": "sec",
"value": total_sec}`` — the roll-up fields, the ambient-calibration
anchors, and the slowest per-query timings sit at the END of the
line, where they survive truncation.

Each query is timed end-to-end (plan + execute + collect-to-count); the
first query's JVM warmup is excluded via an untimed warmup action.
"""

from __future__ import annotations

import json
import os
import sys
import time


def slowest_n(timings: dict, n: int = 10) -> dict:
    """The N costliest successful timings, descending.  Failures
    (timed -1) are carried in "failed", never here — with < n
    successes they'd otherwise pad the tail as "-1 s queries"
    (r7 advice; factored out so tests exercise THIS code, r8 advice)."""
    return dict(
        sorted(
            (kv for kv in timings.items() if kv[1] > 0),
            key=lambda kv: -kv[1],
        )[:n]
    )


def calibrate(spark, sf_dir: str, reps: int = 3) -> dict:
    """Fixed ambient-calibration anchor (r9 verdict item 4).

    Two pinned tiny jobs — a JVM-side scan-aggregate over lineitem and
    a string pass over documents — each run ``reps`` times with the MIN
    taken (min, not median: the anchor estimates the box's best-case
    capability so ratios against it read as pure ambient load).  The
    jobs are deliberately ad-hoc rather than registered queries so the
    anchor is immune to query-code changes across rounds: a future
    reader can normalize cross-round bench ratios from the artifacts
    alone by dividing per-query times by the anchor of their own run.
    """
    jobs = {
        "scan_agg": lambda: spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")
        )
        .groupBy("l_returnflag")
        .agg({"l_extendedprice": "sum", "l_discount": "avg"})
        .collect(),
        "string_pass": lambda: spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        .selectExpr("sum(length(lower(text))) as n")
        .collect(),
    }
    out = {}
    for jname, job in jobs.items():
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            job()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[jname] = round(best, 3)
    return out


def _anchor(spark, sf_dir: str, tag: str) -> tuple[dict | None, list | None]:
    """calibrate() + loadavg, guarded: the anchors are diagnostics and
    must never abort the bench — a missing table or a platform without
    getloadavg() yields null anchor fields, and the suite still runs
    and emits its timings line (r10 advice item 2).  Exactly ONE
    stderr line per anchor, failures folded into it (r11 advice item
    3: a separate FAILED line muddied the tail the comparator's docs
    describe)."""
    errs = []
    try:
        calib = calibrate(spark, sf_dir)
    except Exception as e:
        calib = None
        errs.append(f"calibrate FAILED: {e}")
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError as e:
        load = None
        errs.append(f"loadavg FAILED: {e}")
    suffix = f" ({'; '.join(errs)})" if errs else ""
    print(f"# calib_{tag} {calib} loadavg {load}{suffix}", file=sys.stderr)
    return calib, load


# Mid-suite anchor cadence (r11 verdict item 2): both the r10 and r11
# driver benches tripped the comparator's pre/post >1.5x divergence
# warning — the box changed state MID-run, and a single pre/post pair
# cannot say WHERE, which defeats scalar normalization exactly when it
# is needed.  Re-running the two pinned calib jobs every ZONE_SIZE
# queries costs a few seconds on a ~400 s suite and localizes a state
# change to one zone; scripts/bench_compare.py normalizes per-zone
# when both artifacts carry mids.
ZONE_SIZE = 60


def zone_bounds(names: list[str], zone: int = ZONE_SIZE) -> list[str]:
    """Last query name of each complete zone — the names AFTER which a
    mid-suite anchor fires.  Queries run in sorted-name order, so these
    bounds let a reader reassign any query to its zone by lexicographic
    comparison even though the artifact's "queries" dict is re-sorted
    by cost.  The final (possibly short) zone has no bound: it is
    closed by calib_post.  With ≤ one zone of names there are no mids
    and the pre/post pair already brackets everything."""
    names = sorted(names)
    return [names[i] for i in range(zone - 1, len(names) - 1, zone)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_time_stream_processing_engine_spark.queries import QUERIES
    from real_time_stream_processing_engine_spark.session import get_spark

    spark = get_spark(app_name="rs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup, untimed: JVM/codegen/file-listing + the Python worker pool
    # (forking Arrow workers is a fixed per-session cost that
    # spark.python.worker.reuse amortizes across every later Python stage)
    # force real column decode (a bare count() is answered from parquet
    # footers under aggregatePushdown and warms nothing)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
        "sum(l_extendedprice)"
    ).collect()
    # documents carries the corpus text column — its first decode is the
    # dominant cold-IO cost and belongs to warmup, not to whichever
    # query happens to run first (alphabetically q01)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr(
        "sum(length(text))"
    ).collect()

    def _noop(batches):
        yield from batches

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        _noop, "id long"
    ).count()
    # one throwaway query-shaped pass (scan -> string predicate -> count):
    # the session's FIRST full filter pipeline pays ~1s of one-time
    # analyzer/codegen warm-up that otherwise lands on whichever query
    # sorts first (q01 measured 1.4s vs 0.15s for the same shape at q03)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        "contains(lower(text), 'zzzqqx')"
    ).count()

    # Index prebuild, untimed and DISCLOSED: q46/q62/q73/q74 probe
    # materialized indexes (IVF cells, BM25 postings, date partitions)
    # whose builds are idempotent one-time jobs (manifest-committed,
    # operators/indexing.py).  The timed section below measures the
    # steady-state probe cost — the number that scales to 100 TB —
    # exactly as BASELINE.md documents; the build cost is printed here
    # so it is never hidden.
    for idx_q in (
        "q46_ivf_indexed",
        "q62_bm25_indexed",
        "q73_time_partitioned_scan",
        "q87_ivfpq_indexed",
        "q97_zorder_probe",
    ):
        if idx_q in QUERIES:
            t0 = time.monotonic()
            try:
                QUERIES[idx_q](spark, sf_dir).count()
                print(
                    f"# prebuild {idx_q}: {round(time.monotonic() - t0, 3)}s "
                    "(untimed build-once cost; timed run below measures the probe)",
                    file=sys.stderr,
                )
            except Exception as e:
                print(f"# prebuild {idx_q}: FAILED {e}", file=sys.stderr)

    # ambient anchor, pre-suite: pinned tiny jobs + load average let a
    # future reader normalize cross-round ratios from the artifact
    # alone (r9 verdict item 4 — the last two driver benches were
    # dominated by host state only builder-side notes could explain)
    calib_pre, load_pre = _anchor(spark, sf_dir, "pre")

    timings: dict[str, float] = {}
    bounds = zone_bounds(sorted(QUERIES))
    calib_mid: list[dict | None] = []
    for name in sorted(QUERIES):
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            timings[name] = round(time.monotonic() - t0, 3)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        except Exception as e:  # keep benching; a broken query shows as -1
            timings[name] = -1.0
            print(f"# {name}: FAILED {e}", file=sys.stderr)
        if name in bounds:
            # mid-suite anchor: closes the zone this query ends
            # (untimed — anchor cost never lands on a query)
            mid, _ = _anchor(spark, sf_dir, f"mid{len(calib_mid) + 1}")
            calib_mid.append(mid)

    # ambient anchor, post-suite: the box can degrade mid-run (r9 saw
    # same-code suite totals of 559.9/437.9/428.0 s in one session);
    # pre/post divergence localizes WHEN, not just whether
    calib_post, load_post = _anchor(spark, sf_dir, "post")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf
    total = round(sum(v for v in timings.values() if v > 0), 3)

    # The driver archives only a ~2 KB stdout TAIL, so key order inside
    # the one JSON line is information policy (r6 verdict item 3):
    # "queries" goes first, sorted ASCENDING by cost so the slowest —
    # the queries worth reading — sit at the END of the dict and
    # survive truncation; the roll-up fields (per-family sums,
    # slowest-10, totals) come after it, at the very end of the line.
    # failures (-1) sort LAST, not first: the head of the dict is what
    # truncation eats, and a failure's identity is the one thing the
    # surviving tail must carry (r7 review catch)
    asc = dict(
        sorted(timings.items(), key=lambda kv: (kv[1] < 0, kv[1], kv[0]))
    )
    families: dict[str, float] = {}
    fam_n: dict[str, int] = {}
    for name, v in timings.items():
        f = _family(name)
        families[f] = round(families.get(f, 0.0) + max(v, 0.0), 3)
        fam_n[f] = fam_n.get(f, 0) + 1
    slowest10 = slowest_n(timings)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "queries": asc,
                "families": dict(sorted(families.items(), key=lambda kv: -kv[1])),
                "family_counts": fam_n,
                "slowest10": slowest10,
                "failed": sorted(n for n, v in timings.items() if v < 0),
                "calib_pre": calib_pre,
                "calib_post": calib_post,
                "calib_mid": calib_mid,
                "zone_bounds": bounds,
                "loadavg_pre": load_pre,
                "loadavg_post": load_post,
                "n_queries": len(timings),
                "n_failed": sum(1 for v in timings.values() if v < 0),
                "sf": sf_num,
                "unit": "sec",
                "value": total,
            }
        )
    )
    spark.stop()


# keyword → family, first match wins; used only for the bench roll-up
_FAMILIES = [
    ("stream", "streaming"),
    ("cdc", "streaming"),
    ("dedup", "dedup"),
    ("minhash", "dedup"),
    ("simhash", "dedup"),
    ("jaccard", "dedup"),
    ("neardup", "dedup"),
    ("editdist", "dedup"),
    ("winnowing", "dedup"),
    ("containment", "dedup"),
    ("decontamination", "dedup"),
    ("ann", "similarity"),
    ("knn", "similarity"),
    ("ivf", "similarity"),
    ("cosine", "similarity"),
    ("embedding", "similarity"),
    ("rrf", "similarity"),
    ("negatives", "similarity"),
    ("components", "graph"),
    ("pagerank", "graph"),
    ("triangle", "graph"),
    ("adamic", "graph"),
    ("graph", "graph"),
    ("linkpred", "graph"),
    ("bm25", "text"),
    ("logprob", "text"),
    ("tfidf", "text"),
    ("token", "text"),
    ("langid", "text"),
    ("pii", "text"),
    ("repetition", "text"),
    ("terms", "text"),
    ("bpe", "text"),
    ("vocab", "text"),
    ("topk", "text"),
    ("lsh", "dedup"),
    ("sample", "sampling"),
    ("sampling", "sampling"),
    ("mixture", "sampling"),
    ("reservoir", "sampling"),
    ("upsampling", "sampling"),
    ("curation", "sampling"),
    ("split_assign", "sampling"),
    ("packing", "packing"),
    ("chunking", "packing"),
    ("image", "multimodal"),
    ("audio", "multimodal"),
    ("frame", "multimodal"),
    ("multimodal", "multimodal"),
    ("window", "window"),
    ("rolling", "window"),
    ("asof", "window"),
    ("sessionize", "window"),
    ("anova", "stats"),
    ("kendall", "stats"),
    ("theil", "stats"),
    ("mann", "stats"),
    ("whitney", "stats"),
    ("ks_", "stats"),
    ("woe", "stats"),
    ("powerlaw", "stats"),
    ("hoeffding", "stats"),
    ("xcorr", "stats"),
    ("mase", "stats"),
    ("quantile", "stats"),
    ("percentile", "stats"),
    ("approx", "sketch"),
    ("countmin", "sketch"),
    ("hll", "sketch"),
    ("sketch", "sketch"),
]


def _family(name: str) -> str:
    low = name.lower()
    for kw, fam in _FAMILIES:
        if kw in low:
            return fam
    return "sql"


if __name__ == "__main__":
    main()
