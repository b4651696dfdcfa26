"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is real and tested — schemas, Arrow-batched
``mapInPandas`` decode pipelines, partition sizing — while the codec calls
themselves are STUBBED (this container ships no PIL/ffmpeg/librosa): the
default decoder is a deterministic fake; passing ``strict=True`` raises
NotImplementedError where a real codec would run.

Design for 100 TB of media:
- binary payloads ride in parquet binary columns; metadata is a struct so
  filters on (modality, format, n_bytes) prune/push down WITHOUT touching
  payload bytes (parquet column pruning keeps them unread)
- decode is mapInPandas (Arrow batches) — per-batch Python cost amortized,
  payload never round-trips through per-row pickling
- spark.sql.files.maxPartitionBytes governs scan parallelism; media rows
  are large, so repartition by byte budget before decode (see
  ``repartition_for_decode``)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Test/demo helper: synthesize a binary payload column + metadata
    struct from a text column (deterministic bytes). Real pipelines read
    payloads from object storage; the schema is identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("raw").alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("media"))


def repartition_for_decode(df: DataFrame, bytes_col: str = "media.n_bytes", target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Repartition so each decode task sees ~target_partition_bytes of
    payload — media rows are huge and skewed; row-count partitioning
    starves some executors and OOMs others."""
    total = df.select(F.sum(F.col(bytes_col))).first()[0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


def _fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image-embedding model: fold the
    sha256 digest into ``dim`` floats in [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def decode_features(df: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Arrow-batched decode → feature extraction over (doc_id, payload,
    media). STUB: real codec not available in this container; with
    ``strict=True`` raises NotImplementedError exactly where a real
    decoder (PIL.Image.open / librosa.load / pyav) would be called."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("real media codecs (PIL/librosa/pyav) are not installed in this container")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] if m is not None else None for m in pdf["media"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]],
                    "feature": [_fake_image_features(bytes(p), dim) for p in pdf["payload"]],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4, strict: bool = False) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced "frames" per payload. STUB: real
    video frame extraction would use pyav/ffmpeg; the fake slices the
    payload into n byte-ranges — batch shape, schema, and explode
    semantics match the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("ffmpeg/pyav not installed in this container")
            rows = {"doc_id": [], "frame_idx": [], "frame_sha256": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
                    rows["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
