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
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import SCHEMAS


def _as_stream_dir(path: str) -> str:
    """Spark's file stream source requires a directory; the testdata
    tables are single parquet files.  Stage a symlink dir (no copy)."""
    if os.path.isdir(path):
        return path
    d = os.path.join(tempfile.gettempdir(), "rs_streamdir_" + uuid.uuid5(uuid.NAMESPACE_URL, path).hex)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        os.symlink(path, link)
    return d


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events table (the reference's chunk
    stream, E1).  ``maxFilesPerTrigger`` is the backpressure knob the
    reference lacks (busy-wait blast, ``RainStorm.java:1292-1296``)."""
    reader = spark.readStream.schema(SCHEMAS["events"])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_as_stream_dir(os.path.join(sf_dir, "events.parquet")))
    # same nanos->timestamp conversion as load_table
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_memory_available_now(
    agg: DataFrame, output_mode: str = "complete", name_prefix: str = "rs_mem"
) -> DataFrame:
    """Drain a streaming aggregation with Trigger.AvailableNow into a
    memory sink and return the final table.  Used by correctness checks:
    stream-end state must equal the batch answer."""
    spark = agg.sparkSession
    qname = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"rs_ckpt_{qname}")
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def stream_grouped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: streaming running count per event_type; exactly-once state,
    stream-end == batch groupBy count."""
    src = stream_events(spark, sf_dir)
    agg = src.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return run_to_memory_available_now(agg)
