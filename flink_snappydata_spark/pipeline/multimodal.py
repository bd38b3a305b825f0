"""Multimodal column handling: opaque binary payloads + typed metadata
(north star, SURVEY.md §2.9).

Images/audio/video are ``binary`` columns with a metadata struct; the
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas row
expansion, partition-size control — is real and tested. The actual
codecs (PIL/ffmpeg) are not in this container, so decode is stubbed:
``decode_image`` raises ``NotImplementedError`` unless a codec is
importable, and feature extraction uses a deterministic digest-based
stand-in with the exact signature a real extractor would have.

Scale: binary payloads ride in the same parquet row groups; resize
``spark.sql.files.maxPartitionBytes`` down for large blobs so a task's
Arrow batches stay in memory, and keep metadata in columns (not inside
the blob) so pruning works without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_snappydata_spark.util import spread

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("byte_len", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """documents → multimodal layout: text encoded as the opaque binary
    payload + typed metadata struct (the fixture stand-in for real
    image/audio bytes)."""
    content = F.encode(F.col("text"), "UTF-8")
    return spread(documents, "doc_id").select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).cast("long").alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Decode an image payload. STUB: no codec libs in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL) not present in "
            "this environment; the Spark-side plumbing around it is real"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic digest-based stand-in for a real encoder: byte length,
    SHA-256 hex, and an 8-dim feature derived from the digest. The
    mapInPandas batch shape (N binary rows in → N feature rows out) is
    exactly what a GPU/codec extractor would use.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.sha256(bytes(b)).digest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "sha_hex": [d.hex() for d in digests],
                    "feature": [
                        [b / 255.0 for b in d[:8]] for d in digests
                    ],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """1→N frame sampling (video analog): split each payload into
    ``n_frames`` deterministic chunks — the row-expansion shape of a real
    frame sampler (decode loop stubbed the same way as extract)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    rows.append((int(doc_id), i, b[i * step : i * step + step]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


def media_feature_table(documents: DataFrame) -> DataFrame:
    """Declared-query surface: attach binary → extract features → stable
    scalar columns (oracle-checkable: byte_len vs strlen, sha_hex vs
    sha256)."""
    return (
        extract_features(attach_binary(documents))
        .select("doc_id", "byte_len", "sha_hex")
        .orderBy("doc_id")
    )
