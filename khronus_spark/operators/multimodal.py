"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
`mapInPandas` UDF signatures, batch shapes, partition-preserving
transforms. The actual codec work (JPEG decode, audio resample, video
frame extraction) is stubbed behind `_decode_payload`: the container has
no image/audio libraries, so the stub produces a deterministic fake
"decoded" representation from the bytes; swap `_decode_payload` for a
PIL/ffmpeg call in a real deployment and nothing else changes.

Design for 100 TB: media rows are large, so every operator is
`mapInPandas` (Arrow batches, streaming per-partition, no collect);
metadata-only predicates (kind, width, duration) are plain columns so
Catalyst prunes/pushes them down *before* any payload is touched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from khronus_spark.sources.tables import spread

#: canonical media table schema: payload is opaque binary; metadata is
#: typed columns (filter/prune without touching bytes).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
        StructField("feature", StringType()),  # stub feature vector id
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture: the
    text bytes play the payload; metadata derived from doc stats."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def _decode_payload(payload: bytes) -> bytes:
    """STUB: stands in for the real codec (PIL.Image.open / ffmpeg).
    Deterministic so tests are stable. Raises like a codec would on
    empty input."""
    if not payload:
        raise ValueError("empty media payload")  # NotImplementedError stand-in
    return hashlib.sha256(payload).digest()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payloads (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_payload)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": decoded.map(lambda d: d.hex()[:16]),
                    "feature": decoded.map(lambda d: f"feat_{d[0] % 16:x}"),
                }
            )

    return spread(media, max_partitions=8).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The stub
    slices the payload; a real build would seek/decode. Fan-out happens
    inside the Arrow batch — partitioning is preserved, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n_frames = max(1, int(row["duration_ms"]) // every_ms)
                step = max(1, len(row["payload"]) // n_frames)
                for i in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    payloads.append(bytes(row["payload"][i * step : i * step + step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return spread(media.where(F.col("kind") == "video"), max_partitions=8).mapInPandas(
        run, FRAME_SCHEMA
    )


def resize_metadata(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (no payload touch): target
    dims with aspect preserved — stays in whole-stage codegen."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )
