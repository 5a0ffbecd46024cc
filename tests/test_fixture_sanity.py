"""Fixture-sanity: the loaded frames must agree with DuckDB on the raw
parquet — the test class that catches a silent testdata re-write.

Round-2 postmortem: the driver's events.parquet switched physical type
from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds; the reader's
hard-coded ``div 1000`` silently collapsed a month of 2024 events into
43 minutes of 1970 and broke every ts-dependent query.  These tests pin
the loaded values to DuckDB's reading of the same file, so any future
unit mismatch (or schema drift) fails loudly at the first aggregate.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.sources.readers import (
    SCHEMAS,
    load_table,
    parquet_ts_unit,
)
from tests.conftest import SF_SMOKE, SF_T2
from tests.oracle import duck_connection


def _tables(sf_dir):
    return sorted(
        os.path.basename(p)[: -len(".parquet")]
        for p in glob.glob(os.path.join(sf_dir, "*.parquet"))
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_T2])
def test_events_ts_matches_duckdb_epoch(spark, sf_dir):
    """min/max/sum of epoch-micros(ts) equal DuckDB's over the same file.

    The sum term makes this sensitive to ANY per-row shift, not just the
    extremes; a reintroduced ``div 1000`` (or a new unit drift) fails
    here instantly.
    """
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
        F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("sm"),
        F.count("*").alias("n"),
    ).collect()[0]
    con = duck_connection(sf_dir)
    want = con.sql(
        "SELECT min(epoch_us(ts)), max(epoch_us(ts)), sum(epoch_us(ts)),"
        " count(*) FROM events"
    ).fetchone()
    assert (got["mn"], got["mx"], int(got["sm"]), got["n"]) == (
        want[0],
        want[1],
        int(want[2]),
        want[3],
    )


def test_parquet_ts_unit_sniffs_footer(sf_dir):
    unit = parquet_ts_unit(os.path.join(sf_dir, "events.parquet"), "ts")
    assert unit in ("ms", "us", "ns")


def test_parquet_ts_unit_cache_invalidates_on_rewrite(tmp_path):
    """The sniff cache keys on (file, mtime): rewriting the same path
    with a different physical unit — the exact NANOS->MICROS drift this
    helper exists to catch — must re-sniff, not serve the stale unit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "ev.parquet")
    ts = [1_700_000_000_000_000]
    for unit in ("us", "ns"):
        tbl = pa.table({"ts": pa.array(ts, type=pa.timestamp(unit))})
        pq.write_table(tbl, f)
        # force a distinct mtime even under coarse fs timestamp granularity
        st = os.stat(f)
        os.utime(f, (st.st_atime, st.st_mtime + 1.0 if unit == "ns" else st.st_mtime))
        assert parquet_ts_unit(f, "ts") == unit


def test_parquet_ts_unit_rejects_raw_int(sf_dir):
    # event_id is a plain int64: its epoch unit is unknowable, so the
    # sniffer must refuse rather than guess.
    with pytest.raises(ValueError, match="TIMESTAMP"):
        parquet_ts_unit(os.path.join(sf_dir, "events.parquet"), "event_id")


@pytest.mark.parametrize("name", sorted(SCHEMAS))
def test_table_rowcounts_match_duckdb(spark, sf_dir, name):
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not in fixture")
    con = duck_connection(sf_dir)
    want = con.sql(f"SELECT count(*) FROM {name}").fetchone()[0]
    assert load_table(spark, sf_dir, name).count() == want


def test_orders_date_range_matches_duckdb(spark, sf_dir):
    """Second ts-bearing table (plain TimestampType path) pinned too."""
    od = load_table(spark, sf_dir, "orders")
    got = od.agg(
        F.min(F.unix_micros("o_orderdate")).alias("mn"),
        F.max(F.unix_micros("o_orderdate")).alias("mx"),
    ).collect()[0]
    con = duck_connection(sf_dir)
    want = con.sql(
        "SELECT min(epoch_us(o_orderdate)), max(epoch_us(o_orderdate)) FROM orders"
    ).fetchone()
    assert (got["mn"], got["mx"]) == want
