"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode coverage:
  * **BMP images** (uncompressed 24/32-bit) — REAL decode: header parse,
    pixel extraction to a numpy array, and nearest-neighbor resize that
    re-encodes valid BMP bytes. Pure struct+numpy, no external libs.
  * **WAV audio** (PCM) — REAL decode: RIFF/fmt/data chunk walk; reported
    as (width=sample_rate, height=channels, n_frames=sample count).
  * **FAKE** — the deterministic synthetic format for plumbing tests:
    b"FAKE" + type(1B: 0=img,1=aud,2=vid) + width/height/n_frames (4B LE
    each) + payload bytes.
  * anything else (JPEG/PNG/MP4...) raises NotImplementedError — the
    clearly-marked boundary where PIL/libav would plug in (not available
    in this container).

Everything Spark-side is format-agnostic: schema, partition-preserving
mapInPandas plumbing, Arrow batch shapes, frame sampling, and resize
propagation. Per-row decode errors become rows, never task failures.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


def _decode_bmp(blob: bytes) -> dict:
    """Uncompressed 24/32-bit BMP: BITMAPFILEHEADER + BITMAPINFOHEADER."""
    if len(blob) < 54:
        raise MediaDecodeError("truncated BMP header")
    _, pixel_off = struct.unpack_from("<IxxxxI", blob, 2)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiihHI", blob, 14
    )
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BMP decodes natively; other variants "
            "need an imaging library not available in this container"
        )
    # hostile-input guard: absurd or negative dims must become error rows,
    # never reshape ValueErrors / giant allocations inside the task
    if not (0 < w <= 1 << 20 and 0 < abs(h) <= 1 << 20 and w * abs(h) <= 1 << 26):
        raise MediaDecodeError(f"implausible BMP dimensions {w}x{h}")
    if pixel_off < 54 or pixel_off > len(blob):
        raise MediaDecodeError("BMP pixel offset out of range")
    return {
        "kind": "image",
        "width": int(w),
        "height": abs(int(h)),
        "n_frames": 1,
        "payload_bytes": len(blob) - pixel_off,
        "_bpp": bpp,
        "_pixel_off": pixel_off,
        "_topdown": h < 0,
    }


def _decode_wav(blob: bytes) -> dict:
    """PCM WAV: walk RIFF chunks for fmt (rate/channels/bits) and data."""
    if len(blob) < 44 or blob[8:12] != b"WAVE":
        raise MediaDecodeError("truncated or non-WAVE RIFF")
    pos, rate, channels, bits, data_size = 12, None, None, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= len(blob):
            _fmt, channels, rate = struct.unpack_from("<HHI", blob, pos + 8)
            bits = struct.unpack_from("<H", blob, pos + 22)[0]
        elif cid == b"data":
            data_size = min(size, len(blob) - pos - 8)
        pos += 8 + size + (size & 1)
    if rate is None or data_size is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    bytes_per_sample = max(1, (bits or 8) // 8) * max(1, channels or 1)
    return {
        "kind": "audio",
        "width": int(rate),
        "height": int(channels or 1),
        "n_frames": int(data_size // bytes_per_sample),
        "payload_bytes": int(data_size),
    }


def _decode_one(blob: bytes) -> dict:
    """Dispatch on magic bytes: BMP and WAV decode natively (pure
    struct/numpy); FAKE is the synthetic plumbing format; everything else
    raises NotImplementedError — the boundary where PIL/libav would plug in
    (not available in this container)."""
    if blob is None or len(blob) < 12:
        raise MediaDecodeError("truncated media blob")
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:4] == b"RIFF":
        return _decode_wav(blob)
    if blob[:4] == b"FAKE":
        if len(blob) < 17:
            raise MediaDecodeError("truncated media blob")
        t, w, h, frames = struct.unpack("<BIII", blob[4:17])
        return {
            "kind": _TYPES[t] if t < 3 else "unknown",
            "width": w,
            "height": h,
            "n_frames": frames,
            "payload_bytes": len(blob) - 17,
        }
    raise NotImplementedError(
        "this codec requires PIL/libav, not available in this container"
    )


def bmp_pixels(blob: bytes) -> np.ndarray:
    """(height, width, 3) uint8 RGB array from an uncompressed BMP."""
    d = _decode_bmp(blob)
    w, h, bpp = d["width"], d["height"], d["_bpp"]
    step = bpp // 8
    row_size = (w * step + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(blob, dtype=np.uint8, offset=d["_pixel_off"])
    if len(px) < row_size * h:
        raise MediaDecodeError("truncated BMP pixel data")
    rows = px[: row_size * h].reshape(h, row_size)[:, : w * step].reshape(h, w, step)
    rgb = rows[:, :, :3][:, :, ::-1]  # BGR -> RGB
    if not d["_topdown"]:
        rgb = rgb[::-1]  # bottom-up storage
    return np.ascontiguousarray(rgb)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> uncompressed 24-bit BMP bytes."""
    h, w = rgb.shape[:2]
    step = 3
    row_size = (w * step + 3) & ~3
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, : w * step] = rgb[::-1, :, ::-1].reshape(h, w * step)  # RGB->BGR, bottom-up
    data = body.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def resize_bmp(blob: bytes, max_side: int) -> bytes:
    """REAL resize for BMP media: nearest-neighbor downsample via numpy
    index striding, preserving aspect ratio; re-encodes valid BMP bytes."""
    rgb = bmp_pixels(blob)
    h, w = rgb.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    tw, th = max(1, round(w * scale)), max(1, round(h * scale))
    ys = (np.arange(th) * (h / th)).astype(int).clip(0, h - 1)
    xs = (np.arange(tw) * (w / tw)).astype(int).clip(0, w - 1)
    return encode_bmp(rgb[ys][:, xs])


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


def synth_bmp(i: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic test BMP: a gradient + id-seeded stripe pattern."""
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            ((x * 255) // max(1, w - 1)).astype(np.uint8),
            ((y * 255) // max(1, h - 1)).astype(np.uint8),
            (((x + y + i) % 7) * 36).astype(np.uint8),
        ],
        axis=2,
    )
    return encode_bmp(rgb)


def synth_wav(i: int, rate: int = 8000, n_samples: int = 400) -> bytes:
    """Deterministic test WAV: 16-bit mono PCM square-ish wave."""
    t = np.arange(n_samples)
    wave = (np.sign(np.sin(t * (0.05 + 0.01 * (i % 5)))) * 12000).astype("<i2")
    data = wave.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resize_error", T.StringType()),
    ]
)


def resize_media(media: DataFrame, max_side: int = 64) -> DataFrame:
    """REAL pixel resize for natively-decodable media (BMP): one mapInPandas
    pass emitting re-encoded blobs + new dims; rows whose codec needs an
    external library carry a resize_error instead of failing the task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                if isinstance(blob, memoryview):
                    blob = bytes(blob)
                try:
                    resized = resize_bmp(blob, max_side)
                    d = _decode_bmp(resized)
                    out.append(
                        {
                            "media_id": int(mid),
                            "media": resized,
                            "width": d["width"],
                            "height": d["height"],
                            "resize_error": None,
                        }
                    )
                except (MediaDecodeError, NotImplementedError) as e:
                    out.append(
                        {
                            "media_id": int(mid),
                            "media": None,
                            "width": None,
                            "height": None,
                            "resize_error": type(e).__name__,
                        }
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(batches, RESIZED_SCHEMA)


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
