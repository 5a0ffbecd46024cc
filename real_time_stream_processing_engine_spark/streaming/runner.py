"""Structured Streaming backend.

Replaces the reference's RainStorm delivery plane — per-tuple TCP with
ACK + 5 s retry, at-least-once, duplicates possible on retry
(``Node.java:915-1046``, retry scheduler ``Node.java:1547-1564``, unused
dedup set ``Node.java:117``) — with checkpointed Structured Streaming:
exactly-once stateful results, failure recovery from the write-ahead log
instead of tuple re-send (``Node.java:1048-1085``).

The same :mod:`..operators.core` transforms apply to streaming
DataFrames; ``readStream`` vs ``read`` is the only switch (SURVEY.md §1.4).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import convert_ts_cols, read_schema_for
from ..sources.fsmeta import hadoop_path_exists


def _scratch_dir() -> str:
    """Scratch base for checkpoints/staging.  Honors
    ``SPARK_GRAFT_SCRATCH``; otherwise prefers tmpfs (/dev/shm) — local
    checkpoints are commit-log fsync-bound, and a dev/bench loop has no
    durability requirement (a real deployment points this at HDFS/S3)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm"
    return tempfile.gettempdir()


def _stage_symlink_dir(tag: str, links: dict[str, str]) -> str:
    """Stage a directory of symlinks under scratch, safely.

    The dir is namespaced per-user (uid) and keyed by the *content* of
    the requested layout (link names + targets), so a layout change
    gets a fresh directory instead of silently reusing a stale one.
    Every pre-existing entry is validated: anything that is not a
    symlink to the expected target (a foreign file squatted into the
    shared path, a link left by an older layout) fails loudly rather
    than silently altering stream input."""
    key = uuid.uuid5(
        uuid.NAMESPACE_URL, "|".join(f"{n}->{t}" for n, t in sorted(links.items()))
    ).hex
    d = os.path.join(_scratch_dir(), f"rs_{tag}_u{os.getuid()}_{key}")
    os.makedirs(d, exist_ok=True, mode=0o700)
    for name, target in links.items():
        link = os.path.join(d, name)
        if os.path.islink(link):
            if os.readlink(link) == target:
                continue
            raise RuntimeError(f"stale staging link {link} -> {os.readlink(link)}, expected {target}")
        if os.path.exists(link):
            raise RuntimeError(f"foreign non-symlink entry in staging dir: {link}")
        try:
            os.symlink(target, link)
        except FileExistsError:
            # lost a race with a concurrent stager of the SAME layout
            # (the dir is deliberately shared per-uid + content key) —
            # fine iff the winner created exactly the expected link
            if not (os.path.islink(link) and os.readlink(link) == target):
                raise
    extra = set(os.listdir(d)) - set(links)
    if extra:
        raise RuntimeError(f"unexpected entries in staging dir {d}: {sorted(extra)}")
    return d


def _as_stream_dir(path: str) -> str:
    """Spark's file stream source requires a directory; the testdata
    tables are single parquet files.  Stage a symlink dir (no copy).

    FLAT directories (every part a direct child) pass through
    UNCHANGED (r7 advice): staging snapshots the part list at stream
    construction, so a live drop-zone directory would silently never
    stream files that land after start — the continuous-ingest case
    the maxFileAge=36500d setting explicitly targets.  Spark's file
    source polls a raw flat directory for new arrivals on every
    trigger, which is the semantics an ingest caller expects.

    Single files and NESTED directories still stage one link per part
    (the file stream source lists non-recursively, so an unstaged
    nested drop-zone would silently stream only top-level files);
    staged nested sources are therefore FROZEN at start, and hive
    layouts are refused loudly by `_expand_links`, exactly as for the
    five maintained-table paths.

    A ``file:``-spelled LOCAL path is normalized first (r9, same
    policy as every other driver-local consumer): the os-level listing
    below would otherwise refuse a directory Spark itself reads."""
    from ..sources.fsmeta import list_part_files, strip_file_scheme

    path = strip_file_scheme(path)
    parts = list_part_files(path)
    if parts != [path]:
        entries = [
            e for e in os.listdir(path) if not e.startswith(("_", "."))
        ]
        # flat = every part a direct child AND no stray non-parquet
        # entries (a .csv in the drop zone would feed the raw parquet
        # stream reader; staging used to filter it — keep that safety
        # by falling back to staging for mixed-content dirs)
        all_direct = all(
            os.path.dirname(os.path.relpath(p, path)) == "" for p in parts
        )
        if all_direct:
            if len(entries) == len(parts):
                return path
            # Flat layout, but stray non-parquet entries force the
            # staged (snapshot-at-start) path.  That DEMOTES a live
            # drop-zone to a frozen file list — files landing after
            # stream start are silently never streamed — so say so
            # loudly instead of letting the caller discover a frozen
            # ingest by absence (r8 advice).
            strays = sorted(
                set(entries)
                - {os.path.relpath(p, path) for p in parts}
            )
            warnings.warn(
                f"stream source directory {path!r} is flat but contains "
                f"non-parquet entries {strays[:5]!r}; staging a snapshot "
                "of its current part files instead of polling it live — "
                "files added after stream start will NOT be streamed. "
                "Remove the stray entries to get live drop-zone polling.",
                RuntimeWarning,
                stacklevel=2,
            )
    return _stage_symlink_dir("streamdir", _expand_links("streamdir", path))


def _expand_links(prefix: str, src_path: str) -> dict[str, str]:
    """Per-part symlink map for one source table, file OR directory.

    The file stream source lists a directory NON-recursively, so a
    multi-file table (directory of part files — the multi-batch test
    layout, and any real ingest drop zone) must be staged as one link
    per part, not one link to the directory.  Part discovery goes
    through the shared filter in :mod:`sources.fsmeta`."""
    from ..sources.fsmeta import list_part_files

    parts = list_part_files(src_path)
    if parts == [src_path]:
        return {f"{prefix}.parquet": src_path}
    # Key links by the path RELATIVE to src_path with separators
    # flattened, not by basename: part discovery is recursive, and
    # nested drop-zone layouts (batch1/part-00000, batch2/part-00000)
    # repeat part filenames across subdirectories — basename keys
    # silently collapsed those to one link (r5 advice: silent data
    # loss).  HIVE-partitioned layouts are refused outright: their
    # key=value directory names carry column VALUES that a flattened
    # symlink dir cannot represent (Spark parses partition values from
    # directory names only), so staging one would stream rows missing
    # the partition columns the batch reader resolves — the same
    # refuse-dont-flatten contract as catalog.merge_table (r6 review
    # catch).
    links: dict[str, str] = {}
    for p in parts:
        rel = os.path.relpath(p, src_path) if p != src_path else os.path.basename(p)
        comps = rel.split(os.sep)[:-1]
        hive = [c for c in comps if "=" in c]
        if hive:
            raise RuntimeError(
                f"refusing to stage hive-partitioned layout {src_path!r} as a "
                f"flat stream dir: directory component(s) {hive} carry "
                "partition-column values that symlink flattening would drop "
                "(rows would stream without those columns). Point the stream "
                "at a flat copy, or read the directory directly."
            )
        name = f"{prefix}_{rel.replace(os.sep, '__')}"
        if name in links:
            raise RuntimeError(
                f"duplicate staged link name {name!r} for {links[name]} and {p}"
            )
        links[name] = p
    return links


def _env_max_files_per_trigger() -> int | None:
    """Harness knob: SPARK_GRAFT_STREAM_MAX_FILES forces every file-fed
    stream into N-files-per-micro-batch mode, so the multi-batch
    differential suite (tests/test_streaming_multibatch.py) can drive
    the SHIPPED query functions through real micro-batch sequences
    (watermark advances BETWEEN batches) instead of the one-shot
    availableNow drain that hid the sliding-WAU watermark bug.
    Non-positive values mean "unset" (maxFilesPerTrigger must be
    positive or Spark rejects the stream at start)."""
    v = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
    if not v:
        return None
    try:
        n = int(v)
    except ValueError:
        raise ValueError(
            f"SPARK_GRAFT_STREAM_MAX_FILES must be an integer "
            f"(non-positive means unset), got {v!r}"
        ) from None
    return n if n > 0 else None


def _staged_events_stream(spark: SparkSession, d: str, src_path: str,
                          default_max_files: int | None = 1) -> DataFrame:
    """Shared reader setup for every staged-events file stream (the
    dedup/CDC/count-min/binned/bitmap paths): unit-sniffed schema + ts
    conversion (never diverging from batch reads) and
    maxFilesPerTrigger — the SPARK_GRAFT_STREAM_MAX_FILES harness
    override first, the caller's default otherwise.  Factored so a
    reader-setup change cannot silently reach only some of the five
    call sites (reviewed r5)."""
    schema, conv = read_schema_for("events", src_path)
    mft = _env_max_files_per_trigger()
    if mft is None:
        mft = default_max_files
    # maxFileAge defaults to 7d: on a long-running stream a backfill
    # file whose mtime is >7d older than the newest seen file is
    # SILENTLY never picked up, breaking stream==batch (r7 review).
    # The seen-files map this grows is bounded by file count, not data.
    reader = spark.readStream.schema(schema).option("maxFileAge", "36500d")
    if mft is not None:
        reader = reader.option("maxFilesPerTrigger", mft)
    return convert_ts_cols(reader.parquet(d), conv)


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events table (the reference's chunk
    stream, E1).  ``maxFilesPerTrigger`` is the backpressure knob the
    reference lacks (busy-wait blast, ``RainStorm.java:1292-1296``)."""
    path = os.path.join(sf_dir, "events.parquet")
    # unit-sniffed schema + conversion SHARED with load_table, so batch
    # and stream reads can never diverge on the timestamp unit
    schema, conv = read_schema_for("events", path)
    # maxFileAge: see _staged_events_stream — the 7d default silently
    # skips old-mtime backfills on long-running streams
    reader = spark.readStream.schema(schema).option("maxFileAge", "36500d")
    if max_files_per_trigger is None:
        max_files_per_trigger = _env_max_files_per_trigger()
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_as_stream_dir(path))
    return convert_ts_cols(df, conv)


def stream_rate(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Unbounded rate source: (timestamp, value) tuples generated
    forever — the no-dependency stand-in for the reference's continuous
    stage-1 tuple flow (``Node.java:915-981``) when no external feed is
    wired up.  Use with :func:`run_continuous`."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def stream_socket(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """Unbounded socket text source (one tuple per line) — the direct
    analogue of the reference's TCP tuple server
    (``Node.java:1434-1464``): a live producer writes lines to
    ``host:port`` and they flow through the same operator chain as file
    batches.  At-most-once on its own (no offset tracking in the TCP
    protocol) — parity with what the reference's socket actually
    guarantees before its ACK layer; production feeds use a replayable
    log source instead."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source — the replayable-log feed a production deployment
    uses where the reference used raw TCP (offset tracking in the
    checkpoint gives exactly-once, which :func:`stream_socket` cannot).

    GATED: the ``spark-sql-kafka`` connector jar is not bundled with
    pyspark and this environment installs no packages, so this raises a
    clear, actionable error when the connector is absent instead of the
    opaque ``Failed to find data source: kafka`` at query start.  With
    the connector on the classpath (``spark-submit --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``) the
    returned stream carries the standard key/value/topic/partition/
    offset/timestamp columns."""
    try:
        # probe through Spark's context-or-Spark classloader (a jar
        # added via ADD JAR / spark.jars is visible there but NOT to
        # the raw system-classloader Class.forName)
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider", False, False
        )
    except Exception as e:
        raise RuntimeError(
            "Kafka connector not on the classpath: launch with "
            "spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (or add the jar to spark.jars). "
            "For a dependency-free live feed use stream_socket/stream_rate."
        ) from e
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def run_continuous(
    df: DataFrame,
    name: str | None = None,
    trigger_interval: str = "1 second",
    output_mode: str = "append",
    checkpoint: str | None = None,
):
    """Start a NAMED long-running streaming query into a memory sink and
    return the live ``StreamingQuery`` — the operational parity surface
    for the reference's job lifecycle (start -> stream -> observe ->
    stop, ``Node.java:1376-1403`` / ``RainStorm.java:842-877``):

    - ``q.status`` / ``q.lastProgress``  — observe
    - ``spark.table(name)``              — read results so far
    - ``q.stop()`` / ``q.awaitTermination(t)`` — lifecycle

    Unlike :func:`run_to_memory_available_now` this does NOT drain and
    stop: the processing-time trigger keeps firing until ``stop()``,
    which is the reference's continuous posture.  The caller owns the
    returned query; a checkpoint dir is created under scratch when not
    supplied."""
    qname = name or f"rs_live_{uuid.uuid4().hex[:8]}"
    # memory-sink queries cannot recover from an existing checkpoint, so
    # the default dir is unique per start (named queries would otherwise
    # trip over the previous run's offsets)
    ckpt = checkpoint or os.path.join(
        _scratch_dir(), f"rs_ckpt_{qname}_u{os.getuid()}_{uuid.uuid4().hex[:8]}"
    )
    return (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=trigger_interval)
        .start()
    )


def run_to_memory_available_now(
    agg: DataFrame, output_mode: str = "complete", name_prefix: str = "rs_mem"
) -> DataFrame:
    """Drain a streaming aggregation with Trigger.AvailableNow into a
    memory sink and return the final table.  Used by correctness checks:
    stream-end state must equal the batch answer.

    Observability: any ``df.observe(name, ...)`` metrics attached
    upstream are summed across micro-batches and left on
    ``run_to_memory_available_now.last_observed`` (``{observation:
    {metric: total}}``) — the engine-side account of tuples processed,
    the role of the reference leader's per-task tuple log
    (``Node.java:1162-1187``), but computed IN the dataflow instead of
    by a log-scraping leader.

    CONTRACT: drains are single-threaded per session — the metric side
    channels (function attributes) and the conf set/restore around the
    drain are not safe against two concurrent drains on one
    SparkSession.  The drain's tmpfs checkpoint is reclaimed on return
    (the unbounded leak in a long bench loop); the memory-sink view
    persists for the session, bounded by result sizes."""
    spark = agg.sparkSession
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(_scratch_dir(), f"rs_ckpt_{qname}")
    # Per-micro-batch cost scales with the number of state-store
    # partitions (each one loads, commits, and fsyncs per batch) — for
    # a single-drain harness over local testdata, 32 stores of a few
    # keys each is pure overhead (~4 s/query -> ~1.5 s at 8; the r12
    # isolated sweep re-measured 8 vs 2 across q42/q136/q30 at
    # 6.1/3.7/3.2 s -> 3.9/2.9/2.0 s, so the local default is now 2).
    # The state partition count is fixed by the checkpoint's first
    # batch, so this only applies to fresh checkpoints; a production
    # job sizes it to the keyspace via the same knob.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    stream_parts = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "2")
    # State-store backend: default HDFS-backed (in-heap, fastest for the
    # small-keyspace local drains); SPARK_GRAFT_STATE_STORE=rocksdb
    # switches to RocksDB — the 100 TB posture where state outgrows the
    # heap (spill-to-disk, changelog checkpointing).  Per-query: the
    # provider is read at query start, restored after.
    prev_store = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    want_rocks = os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb"
    # recentProgress is a RING BUFFER (default 100 entries); a drain
    # with more micro-batches than that would silently undercount the
    # summed observe/state metrics below — size it for the drain
    prev_progress = spark.conf.get(
        "spark.sql.streaming.numRecentProgressUpdates", None
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", stream_parts)
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
        if want_rocks:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            )
        q = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        observed: dict[str, dict[str, float]] = {}
        for p in q.recentProgress:
            om = p.get("observedMetrics") if isinstance(p, dict) else None
            if om is None and hasattr(p, "observedMetrics"):
                om = p.observedMetrics
            for obs_name, row in (om or {}).items():
                tot = observed.setdefault(obs_name, {})
                vals = row.asDict() if hasattr(row, "asDict") else dict(row)
                for k, v in vals.items():
                    if isinstance(v, (int, float)):
                        tot[k] = tot.get(k, 0) + v
        run_to_memory_available_now.last_observed = observed
        # state-operator accounting summed across micro-batches — e.g.
        # numRowsDroppedByWatermark is the engine's own count of late
        # rows discarded by the watermark (pinned by
        # tests/test_watermark_lateness.py)
        state_metrics: dict[str, int] = {}
        for p in q.recentProgress:
            ops = p.get("stateOperators") if isinstance(p, dict) else None
            if ops is None and hasattr(p, "stateOperators"):
                ops = p.stateOperators
            for op in ops or []:
                for k, v in (op if isinstance(op, dict) else {}).items():
                    if isinstance(v, (int, float)):
                        state_metrics[k] = state_metrics.get(k, 0) + v
        run_to_memory_available_now.last_state_metrics = state_metrics
        out = spark.table(qname)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_progress:
            spark.conf.set(
                "spark.sql.streaming.numRecentProgressUpdates", prev_progress
            )
        else:
            spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
        if want_rocks:
            if prev_store:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_store
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        # reclaim the checkpoint (state/offset/commit logs on tmpfs —
        # the unbounded part of a long bench loop; the memory sink's
        # data lives in the driver, so the table stays readable).  In
        # the finally so the EXCEPTION path doesn't leak either (r7
        # review): this checkpoint is fresh-uuid per call, so nothing
        # can ever resume from it.  The temp view itself persists for
        # the session, bounded by result sizes.
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def stream_grouped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: streaming running count per event_type; exactly-once state,
    stream-end == batch groupBy count."""
    src = stream_events(spark, sf_dir)
    agg = src.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return run_to_memory_available_now(agg)


def _windowed_event_counts(
    spark: SparkSession, sf_dir: str, slide: str | None
) -> DataFrame:
    """Shared body of the tumbling/hopping drains (they differ ONLY in
    the slide argument — factored r7 so a watermark/projection fix
    cannot reach one and miss the other)."""
    src = stream_events(spark, sf_dir).withWatermark("ts", "2 hours")
    w = (
        F.window("ts", "1 hour", slide) if slide else F.window("ts", "1 hour")
    ).alias("w")
    agg = (
        src.groupBy(w, "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    return run_to_memory_available_now(agg)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-time tumbling windows on the stream.  Output
    matches the batch tumbling aggregate at stream end.

    Late-data policy: this drain uses COMPLETE output mode, where the
    declared watermark is carried but INERT — Spark neither drops late
    rows nor evicts window state in complete mode, which is what makes
    stream-end == batch the checkable contract here (r7 review: the
    docstring used to claim 2 h drops).  The enforced drop/evict
    policy lives in the append-mode pipelines differentially pinned by
    ``tests/test_watermark_lateness.py`` (too-late dropped and counted
    in ``numRowsDroppedByWatermark``, in-horizon late merged); an
    unbounded deployment of THIS aggregate must switch to append or
    update mode for the watermark to bound state."""
    return _windowed_event_counts(spark, sf_dir, slide=None)


def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows on the stream: 1 h width,
    30 min slide — q53's streaming twin.  Each event lands in 2
    overlapping windows.  Stream-end equals the batch hopping
    aggregate.  Same complete-mode late-data posture as
    :func:`stream_tumbling_counts` (watermark inert in the drain;
    append/update mode makes it bind on an unbounded deployment)."""
    return _windowed_event_counts(spark, sf_dir, slide="30 minutes")


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery emulation + exactly-once dedup (E4 parity).

    The source directory stages the SAME events file twice — every tuple
    arrives (at least) twice, exactly like the reference's 5 s retry
    resend path (``Node.java:1547-1564``), whose unused dedup set
    (``Node.java:117``) lets retries overcount.
    ``dropDuplicatesWithinWatermark`` on the tuple id makes redelivery
    invisible — stream-end counts equal the batch answer over the ONE
    copy — while keeping the dedup state BOUNDED: ids older than the
    event-time watermark are evicted, so on an unbounded stream the
    state store holds one watermark-window of ids, not every id ever
    seen (a retry storm redelivers within seconds; the 2 h window is
    generous)."""
    src_path = os.path.join(sf_dir, "events.parquet")
    d = _stage_symlink_dir(
        "dupdir",
        {**_expand_links("events_a", src_path), **_expand_links("events_b", src_path)},
    )
    src = _staged_events_stream(spark, d, src_path, default_max_files=None
                                ).withWatermark("ts", "2 hours")
    deduped = src.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return run_to_memory_available_now(agg)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30 min gap) over the event stream —
    the streaming form of the batch sessionization (q24); session count
    and per-session event counts match it at stream end.

    Complete mode BY DESIGN for the drain-end oracle: append mode (the
    bounded-state production posture, a watermark GCing closed
    sessions) correctly WITHHOLDS sessions inside the final watermark
    horizon — the event-time watermark is max(ts) - delay and can never
    pass the last sessions, so a drain under-emits exactly those (the
    streaming-correct answer, but not the batch answer; measured 943 of
    946 sessions at sf0.001 with a 2 h watermark).  An unbounded
    deployment adds ``withWatermark`` + append; the oracle pins the
    complete-mode equality."""
    src = stream_events(spark, sf_dir)
    agg = (
        src.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    return run_to_memory_available_now(agg)


def stream_stateful_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9's literal semantics as a CUSTOM stateful operator:
    ``applyInPandasWithState`` holds one count per key — the distributed,
    checkpointed version of the reference's task-local
    ``Map<String,Integer>`` (``Operators.java:21``, ``:93-100``), which
    lived in one JVM and died with it.  Emits the running total per key
    per micro-batch in update mode."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_count(key, pdfs, state: GroupState):
        running = state.get[0] if state.exists else 0
        for pdf in pdfs:
            running += len(pdf)
        state.update((running,))
        yield pd.DataFrame({"event_type": [key[0]], "cnt": [running]})

    src = stream_events(spark, sf_dir)
    out = src.groupBy("event_type").applyInPandasWithState(
        update_count,
        outputStructType="event_type string, cnt long",
        stateStructType="cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    spark_df = run_to_memory_available_now(out, output_mode="update")
    # update-mode sink appends one row per key per batch; the final
    # running total per key is the max (counts are monotone).
    return spark_df.groupBy("event_type").agg(F.max("cnt").alias("cnt"))


def stream_cdc_upsert(
    spark: SparkSession,
    sf_dir: str,
    target_path: str | None = None,
    checkpoint: str | None = None,
    fail_after_batches: int | None = None,
) -> DataFrame:
    """Streaming CDC: ``foreachBatch`` + versioned idempotent merge =
    exactly-once effects over at-least-once delivery.

    The source stages the SAME events file twice with
    ``maxFilesPerTrigger=1`` — every tuple arrives in (at least) two
    micro-batches, the reference's retry-storm delivery
    (``Node.java:1547-1564``).  Each batch: latest-wins rank within
    the batch, then :func:`..operators.cdc.apply_upsert_versioned`
    into a parquet target (read-modify-write behind an atomic swap,
    ``catalog.replace_contents``).  The STRICTLY-newer version gate
    makes the redelivered batch a no-op, so the final target equals
    the batch answer (q67's mapping + version ledger) no matter the
    batch count or order — sink-side dedup with a durable ledger,
    where q30 dedups in the state store instead.

    ``target_path``/``checkpoint`` default to fresh scratch dirs; pass
    both explicitly to RESUME an interrupted run — the checkpoint
    replays unfinished batches, and the version gate makes any batch
    that already half-applied idempotent.  ``fail_after_batches`` is
    the crash-injection hook for that test: the foreachBatch sink
    raises after N batches, exactly like an executor/driver loss
    mid-stream."""
    from ..operators.cdc import apply_upsert_versioned
    from ..sources.catalog import recover_swap, replace_contents
    from ..sources.readers import load_table

    src_path = os.path.join(sf_dir, "events.parquet")
    d = _stage_symlink_dir(
        "cdcdir",
        {**_expand_links("events_a", src_path), **_expand_links("events_b", src_path)},
    )
    if target_path is None:
        target_path = os.path.join(
            _scratch_dir(), f"rs_cdc_target_u{os.getuid()}_{uuid.uuid4().hex[:8]}"
        )
    # recover_swap first: a crash inside replace_contents' rename window
    # leaves the target briefly missing but fully recoverable from its
    # swap siblings — reseeding in that state would silently drop every
    # batch the checkpoint already marked committed.
    if not recover_swap(spark, target_path):  # truly fresh: seed the dim
        # seed through the SAME atomic swap as every batch write — a
        # plain write.parquet could crash mid-commit and leave a
        # partial dir that recover_swap's existence check would then
        # treat as a complete table on restart (reviewed r5)
        replace_contents(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey",
                "c_name",
                "c_acctbal",
                F.lit(None).cast("timestamp").alias("ver_ts"),
                F.lit(None).cast("long").alias("ver_event_id"),
            ),
            target_path,
        )

    from pyspark.sql import Window

    n_applied = {"n": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if (
            fail_after_batches is not None
            and n_applied["n"] >= fail_after_batches
        ):
            raise RuntimeError("injected sink crash (fail_after_batches)")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        updates = (
            batch.select("user_id", "value", "ts", "event_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                (F.col("user_id") * 20 + 1).alias("c_custkey"),
                F.round("value", 2).alias("new_bal"),
                F.concat(
                    F.lit("cdc#"), F.col("user_id").cast("string")
                ).alias("new_name"),
                "ts",
                "event_id",
            )
        )
        merged = apply_upsert_versioned(
            batch.sparkSession.read.parquet(target_path),
            updates,
            key_cols=["c_custkey"],
            set_cols={"c_acctbal": "new_bal"},
            version_cols={"ver_ts": "ts", "ver_event_id": "event_id"},
            insert_only_cols={"c_name": "new_name"},
        )
        replace_contents(merged, target_path)
        n_applied["n"] += 1

    src = _staged_events_stream(spark, d, src_path)
    default_ckpt = checkpoint is None
    ckpt = checkpoint or os.path.join(
        _scratch_dir(), f"rs_ckpt_rs_cdc_{uuid.uuid4().hex[:8]}"
    )
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception as e:
        # suppress ONLY the injected crash (the caller restarts from
        # the same checkpoint + target to prove recovery); a genuine
        # failure in the merge path must not masquerade as one
        if fail_after_batches is None or "injected sink crash" not in str(e):
            raise
    if default_ckpt and fail_after_batches is None:
        # fresh-uuid checkpoint after a clean drain: unresumable by
        # construction — reclaim the tmpfs logs (r7 review: q69 bench
        # loops leaked one per run).  The target stays: it IS the
        # maintained table the returned frame reads.
        shutil.rmtree(ckpt, ignore_errors=True)
    final = spark.read.parquet(target_path)
    return final.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.unix_micros("ver_ts").alias("ver_ts_us"),
        "ver_event_id",
    )


def stream_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel: per-user ordered stage machine (view ->
    click-after-view -> purchase-after-click) as a CUSTOM buffered-state
    operator — the ``applyInPandasWithState`` pattern q32's running
    count doesn't exercise: state holds the user's funnel-relevant
    event history (ts + type arrays), each batch recomputes the exact
    stage over the buffer, and update-mode emissions are monotone (more
    events can only advance a funnel stage), so the max emission per
    user is the stream-end answer.  On an unbounded deployment the
    buffer is bounded by watermark eviction after stage-3 or horizon
    expiry; the drain-end state here equals the batch funnel (q79's
    oracle).  Returns (user_id, stage) — one row per user with their
    final stage 1-3 (users with no view emit nothing).

    STATE-FORMAT NOTE (r12 advice): the persisted ``ts`` array changed
    unit in r12 from epoch-NANOS to epoch-MICROS (the vectorized
    ingestion projects ``unix_micros``).  Every caller here drains
    availableNow with a FRESH checkpoint, so no old-format state can
    be resumed; a deployment that ever resumes long-lived checkpoints
    across code versions must version the checkpoint location (or the
    state schema) when the unit changes — mixing units in one buffer
    would silently corrupt stage ordering."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        ts, tp = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        for pdf in pdfs:
            # vectorized batch ingestion (r12 opt): ts arrives as an
            # int64 epoch-micros column (projected below), so the whole
            # batch lands via two tolist() calls instead of a per-row
            # pandas-Timestamp .value + str() loop.  Stage logic only
            # compares timestamps, and micros preserve ns order.
            ts.extend(pdf["ts"].tolist())
            tp.extend(pdf["event_type"].tolist())
        state.update((ts, tp))
        views = [t for t, y in zip(ts, tp) if y == "view"]
        stage = 0
        if views:
            stage = 1
            vt = min(views)
            clicks = [t for t, y in zip(ts, tp) if y == "click" and t > vt]
            if clicks:
                stage = 2
                ct = min(clicks)
                if any(t > ct for t, y in zip(ts, tp) if y == "purchase"):
                    stage = 3
        if stage:
            yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    src = stream_events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", F.unix_micros("ts").alias("ts"), "event_type")
    out = src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, stage int",
        stateStructType="ts array<long>, tp array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_to_memory_available_now(out, output_mode="update")
    # update mode appends one row per user per batch; stage is monotone
    # in the event set, so the final stage is the max
    return drained.groupBy("user_id").agg(F.max("stage").alias("stage"))


def stream_window_leaderboard(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Continuous leaderboard: hourly event-time windows stream into a
    checkpointed (window, user) count state (the declared 2 h
    watermark bounds it only under append/update mode — this
    complete-mode drain retains all windows, same posture as
    :func:`stream_tumbling_counts`, r7 review);
    the per-window top-k rank runs over the drained stream-end state —
    rank is NOT stateful (a late event can reshuffle the board), so
    the streaming part maintains exactly the commutative aggregate and
    the rank stays a cheap batch view over it.  Stream end equals the
    batch window+rank answer (the oracle)."""
    from pyspark.sql import Window

    src = stream_events(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "user_id",
            "n_events",
        )
    )
    state = run_to_memory_available_now(agg)
    rk = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        state.withColumn("rk", F.row_number().over(rk).cast("long"))
        .filter(F.col("rk") <= k)
        .select("window_start", "rk", "user_id", "n_events")
    )


def stream_stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases within the following hour.

    The reference cannot express any join, let alone a stateful
    streaming one (SURVEY.md §2.5).  Here both sides buffer in the
    state store; the watermark + time-range condition bound how long a
    click/purchase is retained (2 h after event time), so state is
    GC-able and the join runs forever on an unbounded stream.  Inner
    matches emit immediately — no output is withheld at drain end, so
    stream-end equals the batch self-join (the oracle)."""
    return _click_purchase_interval_join(spark, sf_dir, how="inner")


def stream_stream_click_purchase_left_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits — with
    its purchase if one lands within the hour, with NULLs otherwise.

    The outer side is the genuinely stateful half: an unmatched click
    cannot emit until the engine can PROVE no matching purchase is
    still coming, i.e. until the watermark passes the end of the
    click's join window (c_ts + 1 h).  Matched rows emit immediately
    (inner semantics); null rows emit in the no-data micro-batch that
    follows the final watermark advance (SPARK-24156's eager state
    cleanup), which ``Trigger.AvailableNow`` runs before terminating.
    Clicks younger than watermark-delay + window at stream end are
    still held in state — callers wanting a deterministic batch
    equivalence must restrict to the emitted horizon
    (c_ts + 1 h < max_ts - 2 h), which is exactly what q96 does."""
    return _click_purchase_interval_join(spark, sf_dir, how="leftOuter")


def _click_purchase_interval_join(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Shared body of the stream-stream click→purchase interval joins
    (the inner and leftOuter variants were 45-line verbatim copies
    differing only in the join type — factored r7 so a condition/
    watermark/projection fix cannot silently reach only one)."""
    src = stream_events(spark, sf_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    buys = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("b_ts", "2 hours")
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.unix_timestamp("c_ts").alias("click_ts"),
        F.unix_timestamp("b_ts").alias("purchase_ts"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )
    return run_to_memory_available_now(joined, output_mode="append")


def _norm_ckpt(path: str) -> str:
    """Canonical spelling of a checkpoint path for ledger identity:
    strip the file: scheme (any of Hadoop's spellings — `file:/p`,
    `file://p`, `file:///p`), trailing slashes, and (local paths only)
    resolve symlinks — so `file:///tmp/ck/`, `file:/tmp/ck`, `/tmp/ck`,
    and a symlinked scratch spelling of the same checkpoint compare
    equal instead of falsely refusing a legitimate same-checkpoint
    resume (r7+r8 advice: the single-slash `file:/tmp/ck` canonical
    form has no `://`, so the old `file://`-only strip let it fall
    through to realpath, which joined it onto the cwd).
    Non-local URIs (hdfs://, s3a://) only lose trailing slashes —
    realpath would mangle them.  The scheme strip is the shared
    :func:`sources.fsmeta.strip_file_scheme` (r9: one normalizer for
    every driver-local path consumer)."""
    from ..sources.fsmeta import strip_file_scheme

    p = strip_file_scheme(path)
    if "://" in p:
        return p.rstrip("/")
    return os.path.realpath(p)


def _check_ledger_ckpt(recorded: str | None, ckpt: str, target_path: str) -> None:
    """foreachBatch batch ids are CHECKPOINT-LOCAL: a maintained table
    whose ledger was written from a different checkpoint cannot be
    safely continued (new ids restart at 0 <= the old ledger, so every
    batch silently skips — or double-applies if the old run was
    shorter).  Refuse loudly instead (r7 review).  Both sides compare
    NORMALIZED (`_norm_ckpt`) so equivalent spellings of one
    checkpoint — trailing slash, file:// URI, symlinked scratch — do
    not refuse a legitimate resume."""
    if recorded is not None and _norm_ckpt(recorded) != _norm_ckpt(ckpt):
        raise RuntimeError(
            f"maintained table {target_path!r} was last written from "
            f"checkpoint {recorded!r}, but this stream runs from "
            f"{ckpt!r}: batch ids are checkpoint-local, so continuing "
            "would silently skip or double-apply batches. Pass the "
            "original checkpoint to resume, or a fresh target_path."
        )


def stream_countmin(
    spark: SparkSession,
    sf_dir: str,
    item_col: str = "user_id",
    target_path: str | None = None,
    checkpoint: str | None = None,
    fail_after_batches: int | None = None,
) -> DataFrame:
    """Maintain a count-min sketch OVER A STREAM: each micro-batch
    builds its own (row, bucket, c) grid and bucket-sum-merges it into
    a tiny parquet target behind the atomic swap — streaming heavy
    hitters with constant state regardless of key cardinality (the
    aggregation-state alternative holds one counter PER KEY).

    Counting is not latest-wins, so redelivered data would double —
    exactness comes from a batch-id ledger RIDING IN the sketch rows
    (``last_batch`` column, swapped atomically with the counts): a
    replayed foreachBatch id <= the ledger is skipped whole.  Batch
    ids are CHECKPOINT-LOCAL, so the ledger also records which
    checkpoint produced it (``last_ckpt``) and refuses a target/
    checkpoint mismatch loudly — reusing a maintained target with a
    fresh checkpoint would otherwise silently skip every new batch
    (ids restart at 0 <= ledger) or double-count (r7 review).  Merge
    associativity + the ledger give stream-end == batch-sketch EXACT
    equality (pinned in ``tests/test_streaming_live.py``)."""
    from ..operators.sketches import countmin_build, countmin_merge
    from ..sources.catalog import recover_swap, replace_contents

    src_path = os.path.join(sf_dir, "events.parquet")
    d = _stage_symlink_dir("cmsdir", _expand_links("events", src_path))
    if target_path is None:
        target_path = os.path.join(
            _scratch_dir(), f"rs_cms_target_u{os.getuid()}_{uuid.uuid4().hex[:8]}"
        )
    recover_swap(spark, target_path)
    default_ckpt = checkpoint is None
    ckpt = checkpoint or os.path.join(
        _scratch_dir(), f"rs_ckpt_rs_cms_{uuid.uuid4().hex[:8]}"
    )

    n_applied = {"n": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if (
            fail_after_batches is not None
            and n_applied["n"] >= fail_after_batches
        ):
            raise RuntimeError("injected sink crash (fail_after_batches)")
        s = batch.sparkSession
        items = batch.select(F.col(item_col).cast("string").alias("tok"))
        delta = countmin_build(items)
        # Only the first-batch missing-target case may seed from the
        # delta (same contract as stream_binned_counts): any other
        # read failure propagates so the checkpoint retries instead of
        # silently resetting the sketch to one batch's counts.
        if not hadoop_path_exists(s, target_path):
            merged = delta
        else:
            prev = s.read.parquet(target_path)
            head = prev.select(
                F.max("last_batch").alias("b"), F.max("last_ckpt").alias("c")
            ).head()
            _check_ledger_ckpt(head.c, ckpt, target_path)
            if head.b is not None and batch_id <= head.b:
                return  # replayed batch: the ledger makes it a no-op
            merged = countmin_merge(
                prev.drop("last_batch", "last_ckpt"), delta
            )
        replace_contents(
            merged.withColumn("last_batch", F.lit(batch_id)).withColumn(
                "last_ckpt", F.lit(_norm_ckpt(ckpt))
            ),
            target_path,
        )
        n_applied["n"] += 1

    src = _staged_events_stream(spark, d, src_path)
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if default_ckpt and fail_after_batches is None:
        # fresh-uuid checkpoint: nothing can resume from it; reclaim
        # the tmpfs state/offset logs (r7 review: bench loops leaked)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(target_path).drop("last_batch", "last_ckpt")


def stream_lifetime_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime stats via ``transformWithStateInPandas`` — the
    MODERN custom-state API (Spark 4 StatefulProcessor: typed state
    handles, TTL, timers, RocksDB-only) beside q32's classic
    ``applyInPandasWithState``.  ValueState holds (n, sum) per user;
    each micro-batch emits the updated totals (update semantics), and
    the final answer per user is the row with the maximal monotone
    count — which equals the batch groupBy (the oracle).

    transformWithState requires the RocksDB state store, so this query
    pins the provider for its own drain regardless of the session
    default (the in-heap default stays for everything else)."""
    try:  # transformWithState speaks protobuf to the JVM driver worker
        from google.protobuf import descriptor  # noqa: F401
    except Exception as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the google.protobuf "
            "runtime, which this environment does not provide (same "
            "env-gated posture as the Kafka connector); q32's "
            "applyInPandasWithState path covers custom state without it."
        ) from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class LifetimeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, s double")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._agg.get()
            n, s = (prev[0], prev[1]) if prev else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._agg.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    src = stream_events(spark, sf_dir)
    out = src.groupBy("user_id").transformWithStateInPandas(
        LifetimeStats(),
        outputStructType="user_id long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        drained = run_to_memory_available_now(out, output_mode="update")
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        drained.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


def stream_sliding_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users (the WAU curve) ON THE STREAM —
    q126's cover-expansion made continuous, and the repo's first
    CHAINED-stateful-operator pipeline: each event explodes to the 7
    day-windows it covers, a watermarked ``dropDuplicatesWithinWatermark``
    on (cover_day, user) makes every (user, covered day) count once,
    and a downstream tumbling window counts survivors per day — dedup
    state and agg state both watermark-evicted (Spark's multi-stateful
    append-mode support carries the watermark through the chain).

    COUNT DISTINCT over a sliding frame has no incremental streaming
    form; the cover-expansion turns it into dedup + tumbling count,
    both of which DO.  Stream-end output equals q126's batch answer
    plus the 6 trailing cover days the batch day-spine filter drops
    (the oracle keeps them; see the query docstring)."""
    return run_to_memory_available_now(
        sliding_wau_pipeline(stream_events(spark, sf_dir))
    )


def sliding_wau_pipeline(src: DataFrame) -> DataFrame:
    """The cover-expand -> watermarked-dedup -> tumbling-count chain
    behind :func:`stream_sliding_wau`, over any streaming events
    source (tests feed it a choreographed multi-batch file stream).

    WATERMARK SIZING: the watermark column is ``cover_day``, which
    runs up to 6 DAYS AHEAD of the event that produced it — so the
    lateness budget must absorb that skew.  A bare 2 h delay on
    cover_day puts the watermark at max(event_day)+6d-2h, which is
    AHEAD of every cover row a later in-order source day generates
    (day d covers d..d+6, all below that mark): multi-batch runs
    would drop those rows from the dedup operator wholesale and
    undercount the curve.  ``6 days 2 hours`` = the 6-day cover
    expansion + the repo's standard 2 h event lateness policy, so
    the effective mark on EVENT time is max(event)-2h, and any event
    within 2 h lateness lands every one of its cover rows at or
    above the watermark (pinned multi-batch in
    ``tests/test_sliding_wau_multibatch.py``)."""
    covered = src.select(
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("ts")),
                F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cover_day"),
        "user_id",
    ).withWatermark("cover_day", "6 days 2 hours")
    uniq = covered.dropDuplicatesWithinWatermark(["cover_day", "user_id"])
    return (
        uniq.groupBy(F.window("cover_day", "1 day").alias("w"))
        .agg(F.count("*").alias("wau"))
        .select(
            (F.unix_timestamp(F.col("w.start")) / 86400)
            .cast("long")
            .alias("day"),
            F.col("wau").cast("long").alias("wau"),
        )
    )


def stream_binned_counts(
    spark: SparkSession,
    sf_dir: str,
    target_path: str | None = None,
    checkpoint: str | None = None,
    fail_after_batches: int | None = None,
) -> DataFrame:
    """Maintain per-(event_type, value-bin) counts OVER A STREAM with
    the q105 additive-state recipe: each micro-batch's bin counts
    merge into a tiny parquet target behind the atomic swap, a
    batch-id ledger riding in the rows makes replays whole-batch
    no-ops — constant state (types x 10 bins), exactly-once without
    latest-wins semantics.  The ledger records its checkpoint
    (``last_ckpt``) and a target/checkpoint mismatch refuses loudly —
    batch ids are checkpoint-local (r7 review, same gate as
    stream_countmin).  The maintained table is the input every
    distribution monitor (PSI drift, q162) reads for free at any
    moment — the monitoring loop never rescans history."""
    from ..sources.catalog import recover_swap, replace_contents

    src_path = os.path.join(sf_dir, "events.parquet")
    d = _stage_symlink_dir("psidir", _expand_links("events", src_path))
    if target_path is None:
        target_path = os.path.join(
            _scratch_dir(), f"rs_psi_target_u{os.getuid()}_{uuid.uuid4().hex[:8]}"
        )
    recover_swap(spark, target_path)
    default_ckpt = checkpoint is None
    ckpt = checkpoint or os.path.join(
        _scratch_dir(), f"rs_ckpt_rs_psi_{uuid.uuid4().hex[:8]}"
    )

    n_applied = {"n": 0}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if (
            fail_after_batches is not None
            and n_applied["n"] >= fail_after_batches
        ):
            raise RuntimeError("injected sink crash (fail_after_batches)")
        s = batch.sparkSession
        delta = (
            batch.select(
                "event_type",
                F.least(F.lit(9), F.floor(F.col("value") / 10.0))
                .cast("long")
                .alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count("*").alias("n"))
        )
        # Only the first-batch missing-target case may fall back to
        # merged = delta; any OTHER read failure must propagate so the
        # checkpoint retries the batch instead of silently discarding
        # all accumulated state (a transient FS error would otherwise
        # reset the counts to one batch's worth).
        if not hadoop_path_exists(s, target_path):
            merged = delta
        else:
            prev = s.read.parquet(target_path)
            head = prev.select(
                F.max("last_batch").alias("b"), F.max("last_ckpt").alias("c")
            ).head()
            _check_ledger_ckpt(head.c, ckpt, target_path)
            if head.b is not None and batch_id <= head.b:
                return
            merged = (
                prev.drop("last_batch", "last_ckpt")
                .unionByName(delta)
                .groupBy("event_type", "bin")
                .agg(F.sum("n").alias("n"))
            )
        replace_contents(
            merged.withColumn("last_batch", F.lit(batch_id)).withColumn(
                "last_ckpt", F.lit(_norm_ckpt(ckpt))
            ),
            target_path,
        )
        n_applied["n"] += 1

    src = _staged_events_stream(spark, d, src_path)
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if default_ckpt and fail_after_batches is None:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(target_path).drop("last_batch", "last_ckpt")


def stream_bitmap_dau(
    spark: SparkSession,
    sf_dir: str,
    target_path: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Maintain EXACT daily distinct users over a stream as (day, word,
    bits) bitmaps: each micro-batch's bitmap OR-merges into the target.

    The instructive contrast with q105/q162's additive recipe: bitmap
    OR is IDEMPOTENT — a replayed batch ORs in bits that are already
    set and changes nothing — so exactly-once needs NO batch-id
    ledger; the merge's algebra alone absorbs redelivery (the same
    reason q69's latest-wins CDC needs none).  State is
    days x |id-space|/64 words regardless of event volume, and the
    DAU readout is a popcount sum off the maintained table."""
    from ..sources.catalog import recover_swap, replace_contents

    src_path = os.path.join(sf_dir, "events.parquet")
    d = _stage_symlink_dir("daudir", _expand_links("events", src_path))
    if target_path is None:
        target_path = os.path.join(
            _scratch_dir(), f"rs_dau_target_u{os.getuid()}_{uuid.uuid4().hex[:8]}"
        )
    recover_swap(spark, target_path)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        delta = (
            batch.select(
                F.floor(F.unix_timestamp("ts") / F.lit(86400))
                .cast("long")
                .alias("day"),
                F.expr("user_id div 64").alias("w"),
                F.expr("shiftleft(1L, cast(user_id % 64 AS INT))").alias(
                    "bit"
                ),
            )
            .groupBy("day", "w")
            .agg(F.bit_or("bit").alias("bits"))
        )
        # First batch only: no target yet.  Other read errors propagate
        # (see stream_binned_counts) — a swallowed transient failure
        # here would OR one batch's bits over an empty table and lose
        # every previously-set bit.
        if not hadoop_path_exists(s, target_path):
            merged = delta
        else:
            prev = s.read.parquet(target_path)
            merged = (
                prev.unionByName(delta)
                .groupBy("day", "w")
                .agg(F.bit_or("bits").alias("bits"))
            )
        replace_contents(merged, target_path)

    src = _staged_events_stream(spark, d, src_path)
    default_ckpt = checkpoint is None
    ckpt = checkpoint or os.path.join(
        _scratch_dir(), f"rs_ckpt_rs_dau_{uuid.uuid4().hex[:8]}"
    )
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if default_ckpt:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(target_path)
