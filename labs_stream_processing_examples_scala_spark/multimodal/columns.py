"""Multimodal columns — north-star extension.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction run as Arrow-batched pandas
iterators (``mapInPandas``) so bytes never round-trip row-at-a-time.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub: with PIL/soundfile absent, :func:`extract_features`
produces a deterministic fake feature vector from the raw bytes. The
Spark-side plumbing — schema, Arrow batching, partition parallelism,
UDF signatures — is real and tested; swapping in a real decoder is a
one-function change inside `_decode_one`.

Scale notes: binary payloads dominate I/O, so the scan prunes to
(id, payload) only; feature extraction is embarrassingly parallel per
partition (no shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory
per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

FEATURE_DIM = 8

try:  # real decoder if ever available in the image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture corpus as a multimodal table: payload = utf-8 bytes of
    the text (standing in for image/audio bytes), metadata = typed struct
    (modality, n_bytes, content sha256)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat metadata projection (oracle-checkable: byte length + sha256
    are pure functions of the content)."""
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


def _decode_one(payload: bytes) -> list[float]:
    """STUB decode/feature-extract. Real implementation would be:
    PIL.Image.open(BytesIO(payload)) → resize → channel means, or
    soundfile.read → frame-sample → spectral features. Without the
    libs, a deterministic fake: mean byte value per FEATURE_DIM-sized
    stride (numpy-vectorized) — stable, content-sensitive, testable."""
    if _HAVE_PIL:
        raise NotImplementedError("real decoder wiring reserved for images")
    if not payload:
        return [0.0] * FEATURE_DIM
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    stride = max(len(arr) // FEATURE_DIM, 1)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = arr[i * stride : (i + 1) * stride]
        if chunk.size == 0:
            chunk = arr[-stride:]
        feats.append(round(float(chunk.mean()) / 255.0, 6))
    return feats


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: binary → array<float> features.

    Arrow-batched (pandas DataFrame per batch), partition-parallel,
    schema-stable. Output keeps doc_id + meta, replaces payload with
    the feature vector (payload bytes don't travel further)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf[payload_col].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf[payload_col].map(lambda b: _decode_one(bytes(b)) if b is not None else None),
                }
            )

    return df.mapInPandas(batches, schema="doc_id long, n_bytes long, features array<double>")


def _resize_one(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize. Real implementation: PIL.Image.open(BytesIO(payload))
    .resize((width, height)).tobytes(). Without PIL, a deterministic
    fake: stride-sample the payload down to width*height bytes (content-
    sensitive, size-exact, testable)."""
    if _HAVE_PIL:
        raise NotImplementedError("real resize wiring reserved for images")
    target = width * height
    if not payload:
        return bytes(target)
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    idx = (np.arange(target) * len(arr)) // target
    return arr[idx].tobytes()


def resize_images(df: DataFrame, width: int = 4, height: int = 4, payload_col: str = "payload") -> DataFrame:
    """mapInPandas resize: binary → fixed-size binary thumbnail.

    1:1 row mapping, partition-parallel, no shuffle; output payload size
    is exactly width*height bytes so downstream batch memory is bounded
    and predictable regardless of input image sizes — the property that
    matters when a 100 TB corpus mixes 10 KB and 50 MB images."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": pdf[payload_col].map(
                        lambda b: _resize_one(bytes(b), width, height) if b is not None else None
                    ),
                    "thumb_w": width,
                    "thumb_h": height,
                }
            )

    return df.mapInPandas(batches, schema="doc_id long, thumb binary, thumb_w int, thumb_h int")


def sample_frames(df: DataFrame, n_frames: int = 16, every: int = 4, payload_col: str = "payload") -> DataFrame:
    """mapInPandas frame sampling: one binary "video" row → one row per
    sampled frame (doc_id, frame_idx, frame).

    STUB decode: the payload is split into ``n_frames`` equal chunks
    standing in for decoded frames (real implementation: pyav/ffmpeg
    keyframe iteration); every ``every``-th chunk is emitted. The 1→N
    fan-out happens inside the Arrow batch — no explode shuffle, no
    driver involvement, and output row count is bounded at
    ceil(n_frames/every) per input regardless of payload size."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                if b is None:
                    continue
                payload = bytes(b)
                chunk = max(len(payload) // n_frames, 1)
                for fi in range(0, n_frames, every):
                    frame = payload[fi * chunk : (fi + 1) * chunk]
                    if not frame:
                        break
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(frame)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(batches, schema="doc_id long, frame_idx int, frame binary")
