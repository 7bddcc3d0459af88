"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media is modeled the Spark-native way: an opaque ``binary`` content column
plus typed metadata columns, processed with Arrow-batched ``mapInPandas``
(one pandas batch per partition slice — the only sane shape for MB-scale
blobs; a row-at-a-time Python UDF would serialize each blob separately).

The actual codec work (JPEG decode, audio resample, video frame extract)
needs native libraries this environment doesn't ship, so the codec calls
are STUBS: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake stands in
(byte-slice pseudo-decode). Everything Spark-side — schema, batching,
partitioning, UDF signatures, output shapes — is real and tested, so
swapping the fake for pillow/ffmpeg is a one-function change.

Scale notes: blobs never pass through a shuffle here (all ops are
map-only); feature vectors (small) are what downstream joins/aggregations
touch. At 100 TB, keep blobs in their own parquet column (or external
object store with a path column) and let column pruning skip them unless
the decode stage actually runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media relation: id + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic media relation from the documents table:
    content = utf-8 bytes of the text (a stand-in blob), media_type cycles
    by id. Used by tests and the driver queries — real pipelines read
    binaryFile/parquet sources instead."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.concat(F.lit("synthetic://doc/"), F.col(id_col)).alias("source_uri"),
    )


def _fake_decode(content: bytes, media_type: str) -> bytes:
    """Deterministic stand-in for a codec: identity on the byte payload.
    Marked FAKE — replace with pillow/soundfile/ffmpeg bindings."""
    return content


def decode_media(
    df: DataFrame, fake: bool = False, content_col: str = "content"
) -> DataFrame:
    """Decode blobs to raw payloads via mapInPandas.

    With ``fake=False`` this raises NotImplementedError at plan-build time
    (the container has no codec libs); ``fake=True`` runs the deterministic
    fake so the batching/schema path is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (pillow/ffmpeg) are not available in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    out_schema = StructType(
        df.schema.fields + [StructField("payload", BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                None if c is None else _fake_decode(bytes(c), t)
                for c, t in zip(pdf[content_col], pdf["media_type"])
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def media_byte_stats(df: DataFrame) -> DataFrame:
    """Per-blob byte accounting through the Arrow batch path: length and a
    simple deterministic checksum (sum of bytes mod 2^31). Map-only."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("n_bytes", LongType(), True),
            StructField("byte_checksum", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [None if c is None else len(c) for c in pdf["content"]],
                "byte_checksum": [
                    None if c is None else int(sum(bytes(c)) % 2_147_483_647)
                    for c in pdf["content"]
                ],
            }
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-dim feature vector per blob via mapInPandas — the plumbing for
    an embedding model. The featurizer here is a deterministic FAKE
    (bucketed byte histogram, L1-normalized); swap ``featurize`` for a real
    model (ONNX/torch) without touching the Spark side."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def featurize(content: bytes) -> list[float]:
        hist = [0] * dim
        for b in content:
            hist[b % dim] += 1
        total = max(sum(hist), 1)
        return [h / total for h in hist]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [
                        None if c is None else featurize(bytes(c))
                        for c in pdf["content"]
                    ],
                }
            )

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, factor: int = 4) -> DataFrame:
    """Image resize plumbing: per-blob payload transform through the Arrow
    batch path. The resample itself is a deterministic FAKE (keep every
    ``factor``-th byte — a stand-in for pillow's ``Image.resize``);
    non-image rows pass through untouched. Output schema mirrors input
    with ``content`` replaced and ``n_bytes`` updated."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            new_content, new_bytes = [], []
            for mtype, content in zip(pdf["media_type"], pdf["content"]):
                if content is None or mtype != "image":
                    new_content.append(content)
                    new_bytes.append(None if content is None else len(content))
                    continue
                resized = bytes(content)[::factor]
                new_content.append(resized)
                new_bytes.append(len(resized))
            pdf["content"] = new_content
            pdf["n_bytes"] = new_bytes
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video blobs: emit ``n_frames`` evenly-spaced
    byte-slice "frames" per blob (deterministic FAKE for the ffmpeg seek;
    the row-explosion shape — one row in, n rows out — is the real
    contract). Non-video rows pass through with a single full-payload
    frame."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                if content is None:
                    continue
                data = bytes(content)
                if mtype != "video" or len(data) == 0:
                    ids.append(mid)
                    idxs.append(0)
                    frames.append(data)
                    continue
                step = max(len(data) // n_frames, 1)
                for i in range(min(n_frames, len(data))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, out_schema)
