"""Round-8 hardening: the r7 ADVICE items — live drop-zone directory
sources must keep polling (flat dirs pass through `_as_stream_dir`
unstaged), checkpoint-ledger identity must survive equivalent path
spellings, and bench's slowest-10 must never list failures."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.streaming.runner import (
    _as_stream_dir,
    _check_ledger_ckpt,
    _norm_ckpt,
)


# ---------------------------------------------------------------------------
# _as_stream_dir: flat drop-zones pass through; nested/mixed still stage
# ---------------------------------------------------------------------------


def _two_flat_parts(spark, tmp_path):
    d = tmp_path / "drop"
    spark.range(10).coalesce(1).write.parquet(str(tmp_path / "a"))
    spark.range(10, 25).coalesce(1).write.parquet(str(tmp_path / "b"))
    os.makedirs(d)
    for src in ("a", "b"):
        (part,) = [
            f
            for f in os.listdir(tmp_path / src)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        os.rename(tmp_path / src / part, d / f"{src}_{part}")
    return str(d)


def test_flat_directory_passes_through_unstaged(spark, tmp_path):
    d = _two_flat_parts(spark, tmp_path)
    assert _as_stream_dir(d) == d


def test_single_file_still_staged(spark, tmp_path):
    d = _two_flat_parts(spark, tmp_path)
    one = os.path.join(d, sorted(os.listdir(d))[0])
    staged = _as_stream_dir(one)
    assert staged != one and os.path.isdir(staged)


def test_mixed_content_directory_still_staged(spark, tmp_path):
    # a stray non-parquet file in the drop zone would feed the raw
    # parquet stream reader if passed through — staging filters it
    d = _two_flat_parts(spark, tmp_path)
    with open(os.path.join(d, "notes.txt"), "w") as fh:
        fh.write("not parquet")
    staged = _as_stream_dir(d)
    assert staged != d
    assert all(f.endswith(".parquet") for f in os.listdir(staged))


def test_nested_directory_still_staged(spark, tmp_path):
    d = tmp_path / "drop"
    spark.range(5).coalesce(1).write.parquet(str(d / "batch1"))
    staged = _as_stream_dir(str(d))
    assert staged != str(d)


def test_live_drop_zone_streams_late_arriving_files(spark, tmp_path):
    # THE r7 advice case: a file landing AFTER stream start must be
    # streamed on the next trigger.  The old snapshot staging froze
    # the part list at construction and silently dropped it.
    d = _two_flat_parts(spark, tmp_path)
    src_dir = _as_stream_dir(d)
    assert src_dir == d
    stream = (
        spark.readStream.schema("id long")
        .option("maxFileAge", "36500d")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("r8_live_drop")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        n0 = spark.sql("SELECT count(*) c FROM r8_live_drop").first().c
        assert n0 == 25
        # late arrival: write elsewhere, move the part in atomically
        spark.range(100, 140).coalesce(1).write.parquet(str(tmp_path / "c"))
        (part,) = [
            f
            for f in os.listdir(tmp_path / "c")
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        os.rename(tmp_path / "c" / part, os.path.join(d, f"c_{part}"))
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM r8_live_drop").first().c
        assert n1 == 65
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# checkpoint-ledger identity: equivalent spellings compare equal
# ---------------------------------------------------------------------------


def test_norm_ckpt_equivalent_spellings(tmp_path):
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    assert _norm_ckpt(ck + "/") == _norm_ckpt(ck)
    assert _norm_ckpt("file://" + ck) == _norm_ckpt(ck)
    link = str(tmp_path / "alias")
    os.symlink(ck, link)
    assert _norm_ckpt(link) == _norm_ckpt(ck)


def test_norm_ckpt_remote_uri_only_loses_trailing_slash():
    assert _norm_ckpt("hdfs://nn/ck/") == "hdfs://nn/ck"
    assert _norm_ckpt("s3a://bucket/ck") == "s3a://bucket/ck"


def test_ledger_ckpt_same_checkpoint_spellings_accepted(tmp_path):
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    _check_ledger_ckpt(ck + "/", ck, "/t")
    _check_ledger_ckpt("file://" + ck, ck, "/t")
    _check_ledger_ckpt(None, ck, "/t")


def test_ledger_ckpt_foreign_checkpoint_still_refused(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a)
    os.makedirs(b)
    with pytest.raises(RuntimeError, match="checkpoint-local"):
        _check_ledger_ckpt(a, b, "/t")


# ---------------------------------------------------------------------------
# bench slowest-10: failures (-1) never appear as timings
# ---------------------------------------------------------------------------


def test_bench_slowest10_excludes_failures():
    # exercise bench.py's ACTUAL function (r8 advice: an inline mirror
    # pinned a copy, not the code) against a <10-success timing dict
    from bench import slowest_n

    timings = {"q1": 2.0, "q2": -1.0, "q3": 0.5, "q4": -1.0}
    assert slowest_n(timings) == {"q1": 2.0, "q3": 0.5}
    # descending order and the n cut
    assert list(slowest_n({"a": 1.0, "b": 3.0, "c": 2.0}, n=2)) == ["b", "c"]
