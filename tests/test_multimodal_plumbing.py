"""Multimodal decode plumbing: frame sampling (row expansion) and
resize (binary->binary), both Arrow-batched mapInPandas with stubbed
codecs — the schema/batch/partitioning contract is what's under test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.multimodal import (
    THUMB_SIZE,
    resize_images,
    sample_frames,
)
from real_time_stream_processing_engine_spark.sources.readers import load_table


def test_frame_sampling_expands_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    n_docs = docs.count()
    frames = sample_frames(docs, n_frames=4)
    assert frames.count() == n_docs * 4
    per_doc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]
    idxs = {r["frame_idx"] for r in frames.select("frame_idx").distinct().collect()}
    assert idxs == {0, 1, 2, 3}


def test_frame_sampling_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    a = {tuple(r) for r in sample_frames(docs).collect()}
    b = {tuple(r) for r in sample_frames(docs).collect()}
    assert a == b


def test_resize_fixed_size_binary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    thumbs = resize_images(docs)
    assert thumbs.schema["thumb"].dataType.typeName() == "binary"
    lens = thumbs.select(F.length("thumb").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [THUMB_SIZE]
    assert thumbs.count() == docs.count()


def test_resize_repartitions_for_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = resize_images(docs, min_parallelism=8)
    assert out.rdd.getNumPartitions() >= 8


def test_video_container_walker():
    import numpy as np

    from real_time_stream_processing_engine_spark.operators.multimodal import (
        encode_ppm,
        iter_ppm_frames,
    )

    f0 = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    f1 = np.full((2, 3, 3), 7, dtype=np.uint8)  # mixed size AND channels
    payload = encode_ppm(f0) + encode_ppm(f1) + encode_ppm(f0)
    frames = list(iter_ppm_frames(payload))
    assert [f.shape for f in frames] == [(2, 2, 1), (2, 3, 3), (2, 2, 1)]
    assert (frames[0] == f0).all() and (frames[1] == f1).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated frame"):
        list(iter_ppm_frames(payload[:-2]))
    with _pytest.raises(ValueError, match="bad frame header"):
        list(iter_ppm_frames(payload + b"JUNK"))


def test_video_frame_sampler_stride(spark):
    import numpy as np

    from real_time_stream_processing_engine_spark.operators.multimodal import (
        encode_ppm,
        sample_video_frames,
    )

    clip = b"".join(
        encode_ppm(np.full((2, 2, 1), i * 10, dtype=np.uint8)) for i in range(5)
    )
    df = spark.createDataFrame([(1, bytearray(clip))], "doc_id long, payload binary")
    rows = {r.frame_idx: r for r in sample_video_frames(df, stride=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    assert rows[2].sum_px == 80 and rows[2].min_px == 20
    assert rows[0].decode_error is None


def test_truncated_wav_is_quarantined_not_shortened(spark):
    """r5 review: a cut-off WAV still has valid headers; it must land
    in quarantine (decode_error), never decode as a shorter clip."""
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    import numpy as np

    full = encode_wav(np.array([100, -100, 200, -200] * 100), rate=16000)
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(full[: len(full) // 2])


def test_frame_samplers_validate_parameters(spark):
    """r5 review: stride=0 / frame_size=0 used to quarantine EVERY row
    as ZeroDivisionError; they must fail once at the driver."""
    import pytest as _pytest

    from real_time_stream_processing_engine_spark.operators.multimodal import (
        real_audio_frames,
        sample_video_frames,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with _pytest.raises(ValueError, match="stride"):
        sample_video_frames(df, stride=0)
    with _pytest.raises(ValueError, match="frame_size"):
        real_audio_frames(0)
