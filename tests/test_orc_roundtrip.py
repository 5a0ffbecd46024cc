"""ORC interchange: bit-exact round-trip of a real table and the same
scan-side pushdown behavior the parquet plans are pinned to."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.sources.readers import (
    load_table,
    read_orc,
    write_orc,
)


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path, schema=ev.schema)
    assert back.schema == ev.schema
    def digest(df):
        return df.agg(
            F.count("*"),
            F.sum(F.unix_micros("ts")),
            F.expr("bit_xor(" + "xxhash64(" + ", ".join(df.columns) + "))"),
        ).collect()[0]

    a, b = digest(ev), digest(back)
    assert tuple(a) == tuple(b)  # content-exact incl. timestamps


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc2")
    write_orc(ev, path)
    df = read_orc(spark, path).filter(F.col("event_type") == "click").select(
        "event_id"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "event_type" in plan
    m = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "props" not in m  # column pruning reached the ORC scan
