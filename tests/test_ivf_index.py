"""Materialized IVF index: build once, probe with partition pruning.

Turns the documented "at scale the assignment is precomputed and the
table is partitioned by cell id" into pinned behavior: the indexed path
returns exactly the inline ivf_topk answer, and the probe is a
partition filter (pruned before any data file is opened), not a row
filter over the full scan.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
)
from real_time_stream_processing_engine_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def ivf(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(emb, cents, path)
    return emb, cents, path


def test_indexed_topk_equals_inline_topk(spark, ivf):
    emb, cents, path = ivf
    qvec = next(c for cid, c in cents if cid == 0)
    inline = ivf_topk(emb, qvec, cents, k=10, n_probe=4, exclude_id=0).collect()
    indexed = ivf_topk_indexed(
        spark, path, qvec, cents, k=10, n_probe=4, exclude_id=0
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in inline] == [
        (r.vec_id, r.cos_sim) for r in indexed
    ]


def test_index_layout_partitioned_by_cell(spark, ivf):
    emb, cents, path = ivf
    import os

    cells = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    assert len(cells) > 1  # real hive partition dirs, one per populated cell
    # every vector is in exactly one cell
    assert spark.read.parquet(path).count() == emb.count()


def test_probe_is_partition_filter_not_row_filter(spark, ivf):
    _, cents, path = ivf
    qvec = next(c for cid, c in cents if cid == 0)
    df = ivf_topk_indexed(spark, path, qvec, cents, k=10, n_probe=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    # and the pruned scan reads only the probed partitions' bytes:
    # row filter on cell must NOT be needed (no cell filter in PushedFilters)
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf is None or "cell" not in pf.group(1), plan


def _mtimes(path):
    import os

    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_rebuild_skipped_when_manifest_matches(spark, ivf):
    emb, cents, path = ivf
    before = _mtimes(path)
    build_ivf_index(emb, cents, path)  # same params -> no-op
    assert _mtimes(path) == before


def test_codebook_change_forces_rebuild(spark, ivf):
    emb, cents, path = ivf
    before = _mtimes(path)
    # drop one centroid: different codebook -> fingerprint mismatch
    build_ivf_index(emb, cents[:-1], path)
    after = _mtimes(path)
    assert after != before
    # restore the original index for other tests in this module
    build_ivf_index(emb, cents, path, force=True)


def test_force_rebuilds_same_params(spark, ivf):
    emb, cents, path = ivf
    before = _mtimes(path)
    build_ivf_index(emb, cents, path, force=True)
    assert _mtimes(path) != before


def test_pq_encode_exact_centroid_and_ties(spark):
    from real_time_stream_processing_engine_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_lut,
    )

    # 4-dim vectors, 2 subspaces x 2 dims, 2 centroids each
    codebooks = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[0.0, 1.0], [1.0, 0.0]],
    ]
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 1.0, 0.0]),   # sub0 -> c0 exactly; sub1 -> c1 exactly
            (2, [1.0, 1.0, 0.0, 1.0]),   # sub0 -> c1; sub1 -> c0
            (3, [0.5, 0.5, 0.5, 0.5]),   # equidistant everywhere -> ties -> code 0
        ],
        "vec_id: long, embedding: array<double>",
    )
    enc = {r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(df, codebooks).collect()}
    assert enc == {1: [0, 1], 2: [1, 0], 3: [0, 0]}

    # ADC against query = vector 1 itself: vec 1 distance estimate is 0
    lut = pq_lut([0.0, 0.0, 1.0, 0.0], codebooks)
    top = pq_adc_topk(pq_encode(df, codebooks), lut, k=3).collect()
    assert top[0]["vec_id"] == 1 and top[0]["adc_dist"] == 0.0


def test_pq_rejects_ragged_codebooks(spark):
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.similarity import pq_encode

    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id: long, embedding: array<double>")
    with _pytest.raises(ValueError):
        pq_encode(df, [[[0.0]], [[0.0], [1.0]]])


def test_pq_rejects_dim_mismatch(spark):
    """Embedding/codebook drift must fail loudly, not encode a silent
    prefix (too long) or die in an opaque numpy broadcast (too short)."""
    from real_time_stream_processing_engine_spark.operators.similarity import (
        pq_encode,
        pq_lut,
    )

    cbs = [[[0.0, 0.0], [1.0, 1.0]]]  # M=1, sub=2 -> covers 2 dims
    for vec in ([0.0, 0.0, 1.0, 0.0], [0.5]):  # 4 dims and 1 dim
        df = spark.createDataFrame(
            [(1, vec)], "vec_id: long, embedding: array<double>"
        )
        with pytest.raises(Exception, match="dims|M\\*sub"):
            pq_encode(df, cbs).collect()
    with pytest.raises(ValueError, match="M\\*sub"):
        pq_lut([0.0, 0.0, 1.0], cbs)


def test_source_rewrite_invalidates_manifest(spark, tmp_path):
    """The manifest folds a metadata fingerprint of the source: a
    rewritten source dataset (new bytes/mtime) rebuilds the index
    without force=True — no silently-stale probe answers."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    rows = [(i, [float(i % 4 + 1), float(i % 3 + 1)]) for i in range(32)]
    schema = "vec_id: long, embedding: array<double>"
    spark.createDataFrame(rows, schema).write.parquet(src)
    emb = spark.read.parquet(src)
    cents = [(0, [1.0, 3.0]), (1, [3.0, 1.0])]
    build_ivf_index(emb, cents, idx, source_path=src)
    before = _mtimes(idx)
    build_ivf_index(emb, cents, idx, source_path=src)  # unchanged -> no-op
    assert _mtimes(idx) == before
    # rewrite the source in place (more rows: count+bytes+mtime all move)
    spark.createDataFrame(rows + [(99, [9.0, 9.0])], schema).write.mode(
        "overwrite"
    ).parquet(src)
    build_ivf_index(spark.read.parquet(src), cents, idx, source_path=src)
    assert _mtimes(idx) != before
    assert spark.read.parquet(idx).count() == 33


def test_cell_assignment_survives_zero_norm_centroid_and_null_vec(spark):
    """r5 review: a zero-norm centroid (empty k-means cell) makes its
    sim NULL (double div-by-zero), and a NULL sim used to FREEZE the
    argmax fold on the first struct — assigning every vector to the
    lowest cid.  With the -Infinity coalesce, normal vectors assign to
    their true nearest centroid and a null-embedding row degrades to
    the lowest cid deterministically."""
    from real_time_stream_processing_engine_spark.operators.similarity import (
        _cell_assignment_expr,
    )

    centroids = [
        (0, [0.0, 0.0]),   # degenerate: zero norm -> NULL sim
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", _cell_assignment_expr(centroids, "embedding").alias("cell")
        ).collect()
    }
    assert got[1] == 1 and got[2] == 2  # NOT poisoned to cell 0
    assert got[3] == 0  # all-NULL sims: deterministic lowest cid


def test_rp_bucket_bits_beyond_31_do_not_alias(spark):
    """r5 review: shiftleft on an INT literal wraps at bit 31 (j=32
    aliased bit 0).  With the BIGINT shift, hyperplane indices above 31
    contribute distinct bucket bits."""
    from real_time_stream_processing_engine_spark.operators.similarity import (
        _rp_bucket_expr,
    )

    # v1 fires only hyperplane j=32; v2 fires only j=0 — before the
    # fix both produced bucket id 1 (and j=31 went negative)
    hps = [(0, [1.0, 0.0]), (31, [0.0, 1.0]), (32, [-1.0, 1.0])]
    df = spark.createDataFrame(
        [(1, [-1.0, 0.5]), (2, [1.0, -1.0]), (3, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.bkt
        for r in df.select(
            "vec_id", _rp_bucket_expr(hps, "embedding").alias("bkt")
        ).collect()
    }
    assert got[1] == (1 << 31) + (1 << 32)  # j=31 positive, j=32 distinct
    assert got[2] == 1
    assert got[3] == 1 + (1 << 31) + (1 << 32)
    assert len(set(got.values())) == 3
