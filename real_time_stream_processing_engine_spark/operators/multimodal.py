"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer column to object storage) next to typed
metadata; decode/resize/frame-sample runs as a ``mapInPandas`` stage so
bytes move driver-free, Arrow-batched, one Python worker per core, and
the output schema is declared up front so everything downstream is
ordinary columnar Spark.

The decode step itself is STUBBED: real codecs (PIL/ffmpeg/...) are not
in this container.  ``fake_decode_features`` is a clearly-marked
deterministic stand-in (md5-derived) so the Spark-side plumbing —
schema, batching, partitioning — is real and testable; swap the body
for a real decoder without touching any plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feat8", T.StringType()),
    ]
)


def _payloads(
    docs: DataFrame, text_col: str, min_parallelism: int | None
) -> DataFrame:
    """(doc_id, payload) projection, repartitioned for the decode stage.

    When ``min_parallelism`` is set the repartition is UNCONDITIONAL:
    probing the current partition count via ``df.rdd.getNumPartitions()``
    forces an RDD conversion + plan analysis per call, which costs more
    than the shuffle it tries to avoid — and before a CPU-bound Python
    decode the shuffle pays for itself whenever it widens parallelism."""
    with_payload = docs.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )
    if min_parallelism:
        with_payload = with_payload.repartition(min_parallelism)
    return with_payload


def real_decode(payload: bytes) -> dict:
    """Placeholder for a real media decoder (PIL.Image.open /
    torchaudio.load / pyav frame sampling).  Not available in this
    environment."""
    raise NotImplementedError("media codecs not installed; use fake_decode_features")


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE decoder: byte length + first 8 hex chars of
    md5(payload).  Stands in for decode->feature-extract so the Arrow
    batch path and output contract are exercised for real."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": payloads.map(len).astype("int64"),
                "feat8": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()[:8]),
            }
        )


def extract_features(
    docs: DataFrame, text_col: str = "text", min_parallelism: int | None = None
) -> DataFrame:
    """Binary-column feature extraction over documents.

    Builds the binary payload from the text column (the fixture has no
    media blobs), then runs the Arrow-batched decode stage.  The payload
    construction is the only fixture-specific line.

    Decode is CPU-bound Python, so partition count governs throughput:
    a handful of giant input files pins the decode on a few Python
    workers, and thousands of tiny splits churn worker startup.
    ``min_parallelism`` repartitions the payloads to EXACTLY that many
    partitions before the decode (set it to ~2-4x total cores); the one
    shuffle is cheaper than idle or thrashing Python workers."""
    with_payload = _payloads(docs, text_col, min_parallelism)
    return with_payload.mapInPandas(fake_decode_features, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feat", T.StringType()),
    ]
)

THUMB_SIZE = 64

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_len", T.IntegerType()),
    ]
)


def make_frame_sampler(n_frames: int = 4):
    """Row-expanding decode: one binary payload -> ``n_frames`` frame
    rows (the video frame-sampling shape: mapInPandas is a flatMap over
    Arrow batches, so one input row may yield many output rows).

    DETERMINISTIC FAKE: frames are equal byte-slices of the payload,
    "featurized" as md5 prefixes.  A real sampler swaps the slice+md5
    body for pyav keyframe extraction; schema and batching stay put."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step] or raw[-step:]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    feats.append(hashlib.md5(chunk).hexdigest()[:8])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_feat": feats,
                }
            )

    return sample


def sample_frames(
    docs: DataFrame,
    text_col: str = "text",
    n_frames: int = 4,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Frame-sampling stage over binary payloads (video posture)."""
    with_payload = _payloads(docs, text_col, min_parallelism)
    return with_payload.mapInPandas(make_frame_sampler(n_frames), FRAME_SCHEMA)


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1:1 binary->binary decode stage (the image-resize shape: output
    is again an opaque binary column plus typed metadata).

    DETERMINISTIC FAKE: the "thumbnail" is the md5 digest cycled to
    THUMB_SIZE bytes — fixed-size output like a real WxH thumbnail, and
    reproducible for tests.  A real impl swaps the body for
    PIL.Image.open(...).resize(...).tobytes()."""
    for pdf in batches:
        thumbs = []
        for payload in pdf["payload"]:
            d = hashlib.md5(bytes(payload)).digest()
            reps = -(-THUMB_SIZE // len(d))
            thumbs.append((d * reps)[:THUMB_SIZE])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "thumb": thumbs,
                "thumb_len": pd.Series([THUMB_SIZE] * len(thumbs), dtype="int32"),
            }
        )


def resize_images(
    docs: DataFrame, text_col: str = "text", min_parallelism: int | None = None
) -> DataFrame:
    """Resize stage over binary payloads (image posture)."""
    with_payload = _payloads(docs, text_col, min_parallelism)
    return with_payload.mapInPandas(fake_resize, THUMB_SCHEMA)
