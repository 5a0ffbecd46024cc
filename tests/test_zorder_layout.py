"""Z-order clustered layout: correctness AND a measured skipping win.

The layout claim is physical, so the test measures it physically: read
every parquet file's column min/max stats (via pyarrow footers) and
count how many files a 2-d box probe COULD touch under (a) the z-order
layout vs (b) a single-column sorted layout with the same file count.
The curve must dominate: no more files than the sort, and strictly
fewer than the whole table (i.e. real skipping in BOTH dimensions).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.layout import (
    build_zordered,
    read_zordered,
    zvalue,
)
from real_time_stream_processing_engine_spark.sources.readers import load_table

SF2 = "/root/testdata/sf0.01"

BOX_CUST = (30, 90)
BOX_PRICE = (100000.0, 200000.0)
N_FILES = 32


def _overlapping_files(path: str, col_a: str, box_a, col_b: str, box_b) -> tuple[int, int]:
    """(files whose min/max box intersects the probe box, total files)."""
    hits = total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.read_metadata(os.path.join(path, name))
        schema_names = md.schema.to_arrow_schema().names
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        lo_a = min(md.row_group(g).column(ia).statistics.min for g in range(md.num_row_groups))
        hi_a = max(md.row_group(g).column(ia).statistics.max for g in range(md.num_row_groups))
        lo_b = min(md.row_group(g).column(ib).statistics.min for g in range(md.num_row_groups))
        hi_b = max(md.row_group(g).column(ib).statistics.max for g in range(md.num_row_groups))
        if hi_a >= box_a[0] and lo_a <= box_a[1] and hi_b >= box_b[0] and lo_b <= box_b[1]:
            hits += 1
    return hits, total


@pytest.fixture(scope="module")
def layouts(spark):
    orders = load_table(spark, SF2, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"rs_zorder_test_{uuid.uuid4().hex[:8]}"
    )
    zpath = os.path.join(root, "zorder")
    lpath = os.path.join(root, "linear")
    build_zordered(
        orders,
        zpath,
        "o_custkey",
        "o_totalprice",
        n_files=N_FILES,
        source_path=os.path.join(SF2, "orders.parquet"),
    )
    # the comparison layout: same file count, sorted on custkey only
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    yield zpath, lpath
    shutil.rmtree(root, ignore_errors=True)


def test_zorder_layout_preserves_rows(spark, layouts):
    zpath, _ = layouts
    orders = load_table(spark, SF2, "orders")
    z = read_zordered(spark, zpath)
    assert z.count() == orders.count()
    # every original column survives; the z-value column rides along
    assert set(orders.columns) <= set(z.columns)


def test_zorder_box_probe_matches_flat_table(spark, layouts):
    zpath, _ = layouts
    orders = load_table(spark, SF2, "orders")
    box = (
        F.col("o_custkey").between(*BOX_CUST)
        & F.col("o_totalprice").between(*BOX_PRICE)
    )
    z_keys = sorted(
        r[0] for r in read_zordered(spark, zpath).filter(box).select("o_orderkey").collect()
    )
    flat_keys = sorted(
        r[0] for r in orders.filter(box).select("o_orderkey").collect()
    )
    assert z_keys == flat_keys and len(z_keys) > 0


def test_zorder_skips_on_balanced_box(layouts):
    """A box with moderate selectivity in BOTH dimensions: the curve
    bounds each file in both, so it beats the sort (which only bounds
    custkey — 40% of its files survive a 40% custkey range no matter
    what the price predicate says)."""
    zpath, lpath = layouts
    box_cust, box_price = (300, 900), BOX_PRICE
    z_hits, z_total = _overlapping_files(
        zpath, "o_custkey", box_cust, "o_totalprice", box_price
    )
    l_hits, l_total = _overlapping_files(
        lpath, "o_custkey", box_cust, "o_totalprice", box_price
    )
    assert z_total >= N_FILES // 2 and l_total >= N_FILES // 2
    assert z_hits < l_hits
    assert z_hits < z_total


def test_zorder_skips_on_second_dimension_alone(layouts):
    """The structural win over ANY single sort: a probe on the price
    dimension only.  Every custkey-sorted file spans the full price
    range (no pruning at all); the curve gives every file a price
    bound, so most files drop."""
    zpath, lpath = layouts
    full_cust = (-(10**9), 10**9)
    z_hits, z_total = _overlapping_files(
        zpath, "o_custkey", full_cust, "o_totalprice", BOX_PRICE
    )
    l_hits, l_total = _overlapping_files(
        lpath, "o_custkey", full_cust, "o_totalprice", BOX_PRICE
    )
    assert l_hits == l_total  # the sorted layout cannot prune on price
    assert z_hits < z_total  # the curve can
    assert z_hits < l_hits


def test_zvalue_orders_by_interleaved_prefix(spark):
    """The Morton code's defining property: the high bit of each scaled
    dimension lands above every lower bit of either dimension, so
    quadrant ordering is (a-high, b-high) lexicographic-interleaved."""
    rows = [(0, 0), (0, 100), (100, 0), (100, 100)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    out = {
        (r["a"], r["b"]): r["_zval"]
        for r in df.select(
            "a",
            "b",
            zvalue(F.col("a"), F.col("b"), (0, 100), (0, 100), bits=8),
        ).collect()
    }
    # same quadrant ordering as the curve: (0,0) < (0,hi) < (hi,0) < (hi,hi)
    assert out[(0, 0)] < out[(0, 100)] < out[(100, 0)] < out[(100, 100)]


def test_zorder_build_is_idempotent(spark, layouts):
    zpath, _ = layouts
    orders = load_table(spark, SF2, "orders")
    before = sorted(os.listdir(zpath))
    mtimes = {
        n: os.path.getmtime(os.path.join(zpath, n))
        for n in before
        if n.endswith(".parquet")
    }
    build_zordered(
        orders,
        zpath,
        "o_custkey",
        "o_totalprice",
        n_files=N_FILES,
        source_path=os.path.join(SF2, "orders.parquet"),
    )
    after = {
        n: os.path.getmtime(os.path.join(zpath, n))
        for n in sorted(os.listdir(zpath))
        if n.endswith(".parquet")
    }
    assert after == mtimes  # manifest matched: no rewrite
