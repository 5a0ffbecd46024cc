"""Sinks — the reference's output plane (E3), Spark-first.

The reference appends results to ``output/job{N}_results.log`` and a
tuple-provenance log ``job{N}_tuples.log`` on the leader, over UDP, with
duplicate appends possible on retry (``Node.java:1162-1187``, remote
path ``Node.java:1503-1525``, leader write ``RainStorm.java:1338-1354``).
Here:

- batch writes are parquet/csv/text via the committer protocol — a task
  writes to a temp attempt path and commits atomically, so retried tasks
  can never double-append (the failure mode the reference carries);
- provenance is a column set, not a side file: the same information
  (input file, line number, tuple id) travels WITH the rows and is
  written in one pass;
- streaming writes go through ``foreachBatch``/file sinks with
  checkpointed batch ids — replayed micro-batches overwrite instead of
  double-append (exactly-once file output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMATS = ("parquet", "csv", "text", "json")


def write_results(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Batch result sink (``job{N}_results.log`` parity).  The committer
    protocol makes this atomic per job: no partial/duplicate output on
    task retry."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def write_results_with_provenance(
    df: DataFrame, results_path: str, provenance_path: str, fmt: str = "parquet"
) -> None:
    """Results + tuple-provenance logs (``job{N}_tuples.log`` parity).

    The reference logs ``uniqueId:file,line#,line`` per processed tuple
    so a demo run can be audited (``Node.java:1162-1187``).  Here the
    provenance sink captures the same lineage columns if present
    (``src_file``/``line_id``/``uid`` from
    :func:`..sources.readers.read_text_lines`) plus a processing
    timestamp, written once, atomically, alongside the results.

    This runs TWO write jobs over the same plan, so cross-sink uid
    consistency (the whole point of an audit log) requires every lineage
    column to be deterministic under re-evaluation — which
    ``read_text_lines`` guarantees (``uid`` = md5 of src_file:line_id,
    never ``uuid()``).  Pinned by
    ``tests/test_sinks_catalog.py::test_provenance_uids_match_results``.
    The frame is persisted around the pair so the upstream plan (often
    an expensive curation pipeline) executes ONCE, not once per sink
    (r7 review)."""
    prov_cols = [c for c in ("uid", "src_file", "line_id") if c in df.columns]
    if fmt == "text" and prov_cols:
        # validate BEFORE any write: the provenance frame is multi-
        # column and the text source single-column, so the second write
        # would crash AFTER the results committed — exactly the
        # unpaired partial state this function promises cannot happen
        # (r5 review catch)
        raise ValueError(
            "fmt='text' cannot carry the multi-column provenance log; "
            "use parquet/csv/json for paired results+provenance writes"
        )
    if not prov_cols:
        write_results(df, results_path, fmt)
        return
    df = df.persist()
    try:
        write_results(df, results_path, fmt)
        prov = df.select(*prov_cols).withColumn(
            "_processed_at", F.current_timestamp()
        )
        write_results(prov, provenance_path, fmt)
    finally:
        df.unpersist()


def stream_to_files(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Streaming file sink with checkpointed exactly-once output.

    Batch ids recorded in the checkpoint make replays idempotent — the
    strictly-stronger replacement for the reference's append-on-retry
    results path.  Returns the started StreamingQuery.  Validates fmt
    and applies the csv header exactly like the batch path — the same
    logical sink must not produce schema-incompatible output depending
    on which entry point ran (r5 review catch)."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if fmt == "csv":
        writer = writer.option("header", "true")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_cols: list[str],
    order_cols: list[str],
    max_records_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Export the last mile of a curation pipeline as training shards
    with CONTROLLED file geometry — the two failure modes at 100 TB
    are mirror images: thousands of tiny files (per-task dribble) that
    crush the downstream loader's open() rate, and single giant files
    that serialize it.  This pins both:

    - ONE range exchange on ``shard_cols`` clusters each shard's rows
      into the same tasks (no per-task file dribble);
    - an in-partition sort on ``order_cols`` makes every file's row
      order deterministic (resumable loaders index by offset) —
      PROVIDED ``shard_cols + order_cols`` is a total order: rows tied
      on every sort key land in shuffle-arrival order, which varies
      run to run, so pass a unique tie-break (an id column) as the
      last order col (r7 review);
    - ``maxRecordsPerFile`` splits oversized partitions at write time,
      bounding the largest file without another shuffle.

    The reference's results sink appends per-tuple lines with no
    geometry control at all (``Node.java`` results append path); this
    is the posture a petabyte export actually ships with."""
    (
        df.repartitionByRange(*[F.col(c) for c in shard_cols])
        .sortWithinPartitions(*shard_cols, *order_cols)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )
