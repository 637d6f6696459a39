"""Multimodal column handling: opaque binary media + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns alongside a
typed metadata struct; decode / feature-extraction / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages. The actual codec step
is environment-dependent (PIL/ffmpeg are not available in this
container), so decoding is STUBBED: with ``strict=True`` it raises
``NotImplementedError``; by default it produces a deterministic fake
derived from the payload bytes — the Spark-side plumbing (schemas,
partitioning, UDF signatures, Arrow batch shapes) is real and tested.
"""
from __future__ import annotations

import hashlib

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source_url", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("phash", StringType(), True),
    ]
)


def _try_real_decoder():
    try:  # pragma: no cover - decoder libs absent in this environment
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _fake_dimensions(payload: bytes) -> tuple:
    """Deterministic pseudo-decode: dimensions derived from content hash."""
    digest = hashlib.md5(payload or b"").digest()
    width = 64 + digest[0] * 4
    height = 64 + digest[1] * 4
    return width, height


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """binary payloads → per-image feature rows (stubbed decode).

    ``strict=True`` raises NotImplementedError when no real decoder is
    installed — use it to fail fast on clusters that should have codecs.
    """
    decoder = _try_real_decoder()
    if strict and decoder is None:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this environment"
        )

    def run(iterator):
        for pdf in iterator:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                width, height = _fake_dimensions(data)
                out.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(data),
                        "width": width,
                        "height": height,
                        "phash": hashlib.md5(data).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling stub: deterministic byte-window 'frames'.

    Real implementation would shell out to a codec per Arrow batch; the
    partitioning and one-to-many output shape are what this pins down.
    """

    def run(iterator):
        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(len(data) // every_n_bytes, 1))
                for idx in range(n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_payload": data[
                                idx * every_n_bytes : (idx + 1) * every_n_bytes
                            ],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
