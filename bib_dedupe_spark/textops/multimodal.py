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
        StructField("decoder", StringType(), False),
    ]
)


def _try_real_decoder():
    try:
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


def _pil_features(Image, data: bytes) -> dict:
    """Real decode: dimensions + 8x8 average-hash (aHash) fingerprint."""
    import io

    with Image.open(io.BytesIO(data)) as img:
        width, height = img.size
        gray = img.convert("L").resize((8, 8))
        px = list(gray.getdata())
    mean = sum(px) / len(px)
    bits = 0
    for p in px:
        bits = (bits << 1) | (1 if p >= mean else 0)
    return {"width": width, "height": height, "phash": f"{bits:016x}"}


def decode_images(media: DataFrame, strict: bool = True) -> DataFrame:
    """binary payloads → per-image feature rows.

    With PIL installed, features are real (size + average-hash) and rows
    are tagged ``decoder='pil'`` (undecodable payloads yield null features
    tagged ``decoder='error'``). Without PIL: ``strict=True`` (the
    DEFAULT) raises NotImplementedError at plan time — no code path emits
    fake features silently; ``strict=False`` opts into the deterministic
    content-hash pseudo-decode, every row tagged ``decoder='synthetic'``.
    """
    if strict and _try_real_decoder() is None:
        raise NotImplementedError(
            "image decoding requires PIL; install it or pass strict=False"
            " to opt into tagged synthetic features"
        )

    def run(iterator):
        from bib_dedupe_spark.textops.multimodal import _try_real_decoder

        Image = _try_real_decoder()  # probe executor-side, not via closure
        for pdf in iterator:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                row = {"media_id": media_id, "n_bytes": len(data)}
                if Image is not None:
                    try:
                        row.update(_pil_features(Image, data))
                        row["decoder"] = "pil"
                    except Exception:
                        row.update(width=None, height=None, phash=None)
                        row["decoder"] = "error"
                else:
                    width, height = _fake_dimensions(data)
                    row.update(
                        width=width,
                        height=height,
                        phash=hashlib.md5(data).hexdigest()[:16],
                    )
                    row["decoder"] = "synthetic"
                out.append(row)
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
