"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_media`` parses a deterministic fake header — real codecs drop in by
replacing ``_decode_one``. Everything Spark-side is real and tested: schema,
partition-preserving mapInPandas plumbing, Arrow batch shapes, frame
sampling, and resize metadata propagation.

Fake media format (deterministic, produced by ``synth_media``):
    b"FAKE" + type(1B: 0=img,1=aud,2=vid) + width(4B LE) + height(4B LE)
    + n_frames(4B LE) + payload (pseudo-random bytes)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_url", T.StringType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

_TYPES = ["image", "audio", "video"]
_MIMES = {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}


def synth_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (seeded by row id)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                t = i % 3
                w = 16 + (i % 8) * 16
                h = 16 + (i % 5) * 16
                frames = 1 if t == 0 else 8 + i % 24
                payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
                blob = b"FAKE" + struct.pack("<BIII", t, w, h, frames) + payload
                rows.append(
                    {
                        "media_id": i,
                        "media_type": _TYPES[t],
                        "media": blob,
                        "meta": {
                            "source_url": f"https://media.example.org/{i}",
                            "mime": _MIMES[_TYPES[t]],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


class MediaDecodeError(ValueError):
    pass


def _decode_one(blob: bytes) -> dict:
    """STUB decode: parses the fake header. A real implementation would call
    PIL/libav here — those libs aren't in this container, so any non-FAKE
    payload raises NotImplementedError (clearly-marked stub boundary)."""
    if blob is None or len(blob) < 17:
        raise MediaDecodeError("truncated media blob")
    if blob[:4] != b"FAKE":
        raise NotImplementedError(
            "real media decoding requires PIL/libav, not available in this container"
        )
    t, w, h, frames = struct.unpack("<BIII", blob[4:17])
    return {
        "kind": _TYPES[t] if t < 3 else "unknown",
        "width": w,
        "height": h,
        "n_frames": frames,
        "payload_bytes": len(blob) - 17,
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Feature-extraction pass: one mapInPandas, per-row errors become rows
    (never task failures) — the lineage-friendly pattern of the KG stages."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, blob in zip(pdf["media_id"], pdf["media_type"], pdf["media"]):
                if isinstance(blob, memoryview):
                    blob = bytes(blob)
                try:
                    d = _decode_one(blob)
                    out.append(
                        {
                            "media_id": int(mid),
                            "media_type": mtype,
                            "width": d["width"],
                            "height": d["height"],
                            "n_frames": d["n_frames"],
                            "payload_bytes": d["payload_bytes"],
                            "decode_error": None,
                        }
                    )
                except (MediaDecodeError, NotImplementedError) as e:
                    out.append(
                        {
                            "media_id": int(mid),
                            "media_type": mtype,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "payload_bytes": None,
                            "decode_error": type(e).__name__,
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame sampling plumbing: explode (media_id, frame_idx) for every nth
    frame — JVM-side sequence, the decode of each frame stays stubbed."""
    decoded = decode_media(media).filter(F.col("decode_error").isNull())
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


def resize_meta(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize planning: compute target dims preserving aspect ratio —
    pure column math; the pixel work would live in the stubbed decode."""
    decoded = decode_media(media).filter(F.col("decode_error").isNull())
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int")).alias("target_width"),
        F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int")).alias("target_height"),
    )
