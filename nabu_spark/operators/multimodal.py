"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode coverage:
  * **BMP images** (uncompressed 24/32-bit) — REAL decode: header parse,
    pixel extraction to a numpy array, and nearest-neighbor resize that
    re-encodes valid BMP bytes. Pure struct+numpy, no external libs.
  * **PNG images** (8-bit gray/RGB/palette/gray-alpha/RGBA, non-interlaced)
    — REAL decode: chunk walk, zlib inflate with a size-bounded
    decompressor (zip-bomb guard), per-row unfiltering (None/Sub/Up/
    Average/Paeth) in numpy, palette lookup; plus a minimal deterministic
    encoder for resize round-trips. Pure stdlib zlib + numpy.
  * **WAV audio** (PCM) — REAL decode: RIFF/fmt/data chunk walk; reported
    as (width=sample_rate, height=channels, n_frames=sample count).
  * **FAKE** — the deterministic synthetic format for plumbing tests:
    b"FAKE" + type(1B: 0=img,1=aud,2=vid) + width/height/n_frames (4B LE
    each) + payload bytes.
  * anything else (JPEG/MP4, 16-bit or interlaced PNG...) raises
    NotImplementedError — the clearly-marked boundary where PIL/libav
    would plug in (not available in this container).

Everything Spark-side is format-agnostic: schema, partition-preserving
mapInPandas plumbing, Arrow batch shapes, frame sampling, and resize
propagation. Per-row decode errors become rows, never task failures.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    """Deterministic media table (seeded by row id): image rows with even id
    are REAL 8-bit RGB PNGs, video rows with even id are REAL animated GIFs
    (both exercising the native codecs); everything else is the FAKE
    plumbing format. Dimensions follow the same id formulas either way, so
    the decoded header stays formula-recomputable by SQL."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                t = i % 3
                w = 16 + (i % 8) * 16
                h = 16 + (i % 5) * 16
                frames = 1 if t == 0 else 8 + i % 24
                if t == 0 and i % 2 == 0:
                    blob = synth_png(i, w, h)
                    mime = "image/png"
                elif t == 2 and i % 2 == 0:
                    # even-id video rows are REAL animated GIFs
                    blob = synth_gif(i, w, h, frames)
                    mime = "image/gif"
                else:
                    payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
                    blob = b"FAKE" + struct.pack("<BIII", t, w, h, frames) + payload
                    mime = _MIMES[_TYPES[t]]
                rows.append(
                    {
                        "media_id": i,
                        "media_type": _TYPES[t],
                        "media": blob,
                        "meta": {
                            "source_url": f"https://media.example.org/{i}",
                            "mime": mime,
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/pixel


def _png_chunks(blob: bytes):
    pos = 8
    while pos + 8 <= len(blob):
        length = int.from_bytes(blob[pos : pos + 4], "big")
        ctype = blob[pos + 4 : pos + 8]
        if length > len(blob) - pos - 8:
            raise MediaDecodeError("PNG chunk length out of range")
        yield ctype, blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 CRC (not verified)
        if ctype == b"IEND":
            return


def _decode_png(blob: bytes) -> dict:
    """PNG header + IDAT accounting (pixels decoded lazily by png_pixels).
    payload_bytes reports the DECODED pixel byte count (h * w * channels) —
    deterministic in the header alone, unlike compressed stream length."""
    if len(blob) < 33 or blob[:8] != _PNG_SIG:
        raise MediaDecodeError("truncated or non-PNG signature")
    chunks = _png_chunks(blob)
    ctype, ihdr = next(chunks)
    if ctype != b"IHDR" or len(ihdr) < 13:
        raise MediaDecodeError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    # hostile-input guard, same policy as BMP
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20 and w * h <= 1 << 26):
        raise MediaDecodeError(f"implausible PNG dimensions {w}x{h}")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced PNG decodes natively; other variants "
            "need an imaging library not available in this container"
        )
    channels = _PNG_CHANNELS[color_type]
    return {
        "kind": "image",
        "width": int(w),
        "height": int(h),
        "n_frames": 1,
        "payload_bytes": int(w) * int(h) * channels,
        "_color_type": color_type,
        "_channels": channels,
    }


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filters. raw is (h, 1+stride) int16; returns (h,
    stride) uint8. Sub rows vectorize as per-lane cumsum; Up as a running
    add; Average/Paeth keep the inherent left-recursion per byte."""
    out = np.zeros((h, stride), dtype=np.int16)
    for y in range(h):
        f = int(raw[y, 0])
        row = raw[y, 1:]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            r = row.copy()
            for lane in range(bpp):
                r[lane::bpp] = np.cumsum(r[lane::bpp]) & 0xFF
            out[y] = r
        elif f == 2:  # Up
            out[y] = (row + prev) & 0xFF
        elif f == 3:  # Average
            r = out[y]
            for x in range(stride):
                left = r[x - bpp] if x >= bpp else 0
                r[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            r = out[y]
            for x in range(stride):
                a = int(r[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (row[x] + pred) & 0xFF
        else:
            raise MediaDecodeError(f"invalid PNG filter type {f}")
    return out.astype(np.uint8)


def png_pixels(blob: bytes) -> np.ndarray:
    """(height, width, 3) uint8 RGB array from an 8-bit non-interlaced PNG."""
    d = _decode_png(blob)
    w, h, channels, color_type = d["width"], d["height"], d["_channels"], d["_color_type"]
    stride = w * channels
    expected = h * (stride + 1)
    palette = None
    dec = zlib.decompressobj()
    parts = []
    got = 0
    for ctype, data in _png_chunks(blob):
        if ctype == b"PLTE":
            palette = np.frombuffer(data[: (len(data) // 3) * 3], dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            # size-bounded inflate: never allocate beyond the expected
            # scanline bytes no matter what the stream claims (zip bomb)
            part = dec.decompress(data, expected - got)
            got += len(part)
            parts.append(part)
            if got >= expected:
                break
    scan = b"".join(parts)
    if len(scan) < expected:
        raise MediaDecodeError("truncated PNG pixel data")
    raw = np.frombuffer(scan[:expected], dtype=np.uint8).astype(np.int16).reshape(h, stride + 1)
    px = _png_unfilter(raw, h, stride, bpp=channels).reshape(h, w, channels)
    if color_type == 2:
        return np.ascontiguousarray(px)
    if color_type == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color_type 3: palette lookup with index bound guard
    if palette is None or len(palette) == 0:
        raise MediaDecodeError("palette PNG missing PLTE")
    idx = px[:, :, 0]
    if int(idx.max()) >= len(palette):
        raise MediaDecodeError("PNG palette index out of range")
    return np.ascontiguousarray(palette[idx])


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> deterministic 8-bit RGB PNG (filter 0 rows,
    fixed-level zlib) — byte-reproducible across runs."""
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


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
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:4] == b"RIFF":
        return _decode_wav(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
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


def _nn_resize(rgb: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downsample via numpy index striding, preserving
    aspect ratio (never upscales)."""
    h, w = rgb.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    tw, th = max(1, round(w * scale)), max(1, round(h * scale))
    ys = (np.arange(th) * (h / th)).astype(int).clip(0, h - 1)
    xs = (np.arange(tw) * (w / tw)).astype(int).clip(0, w - 1)
    return rgb[ys][:, xs]


def resize_bmp(blob: bytes, max_side: int) -> bytes:
    """REAL resize for BMP media: re-encodes valid BMP bytes."""
    return encode_bmp(_nn_resize(bmp_pixels(blob), max_side))


def resize_png(blob: bytes, max_side: int) -> bytes:
    """REAL resize for PNG media: decode, downsample, re-encode as RGB PNG."""
    return encode_png(_nn_resize(png_pixels(blob), max_side))


def resize_image(blob: bytes, max_side: int) -> bytes:
    """Format-dispatching pixel resize: each natively-decodable image codec
    re-encodes in its own format; others raise for the caller's error row."""
    if blob[:2] == b"BM":
        return resize_bmp(blob, max_side)
    if blob[:8] == _PNG_SIG:
        return resize_png(blob, max_side)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return resize_gif(blob, max_side)
    raise NotImplementedError(
        "this codec requires PIL/libav, not available in this container"
    )


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


def synth_png(i: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic test PNG: same gradient + id-seeded stripes as
    synth_bmp, through the native encoder."""
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            ((x * 255) // max(1, w - 1)).astype(np.uint8),
            ((y * 255) // max(1, h - 1)).astype(np.uint8),
            (((x + y + i) % 7) * 36).astype(np.uint8),
        ],
        axis=2,
    )
    return encode_png(rgb)


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
    """REAL pixel resize for natively-decodable media (BMP, PNG, GIF — each
    re-encoded in its own format, GIF frame-by-frame): one mapInPandas pass
    emitting resized blobs + new dims; rows whose codec needs an external
    library carry a resize_error instead of failing the task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                if isinstance(blob, memoryview):
                    blob = bytes(blob)
                try:
                    resized = resize_image(blob, max_side)
                    d = _decode_one(resized)
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


# --- native GIF codec (87a/89a subset: LZW, palettes, interlace, frames) -----


def _gif_subblocks(blob: bytes, pos: int, *, collect: bool = True) -> tuple[bytes, int]:
    """Walk a GIF sub-block chain starting at ``pos``; returns
    (data, pos_after_terminator). ``collect=False`` skips without copying —
    the header/lineage path advances past frame data for free. Raises on
    truncation."""
    out = bytearray() if collect else None
    n = len(blob)
    while True:
        if pos >= n:
            raise MediaDecodeError("truncated GIF sub-block chain")
        size = blob[pos]
        pos += 1
        if size == 0:
            return (bytes(out) if collect else b""), pos
        if pos + size > n:
            raise MediaDecodeError("truncated GIF sub-block")
        if collect:
            out += blob[pos : pos + size]
        pos += size


_GIF_MAX_PIXELS = 64_000_000  # decompression-bomb guard (frames x w x h)
_GIF_MAX_FRAMES = 10_000


def _parse_gif(blob: bytes, *, want_frames: bool) -> dict:
    """Structural parse: screen size, frame descriptors, palettes. LZW data
    is collected only when ``want_frames`` (pixel decode is on-demand —
    header/lineage paths never pay for it)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
        raise MediaDecodeError("not a GIF")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x07))
        if pos + size > len(blob):
            raise MediaDecodeError("truncated GIF color table")
        gct = np.frombuffer(blob[pos : pos + size], dtype=np.uint8).reshape(-1, 3)
        pos += size
    frames = []
    total_px = 0
    n = len(blob)
    while pos < n:
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-block chain, skipped
            if pos >= n:
                raise MediaDecodeError("truncated GIF extension")
            pos += 1
            _, pos = _gif_subblocks(blob, pos, collect=False)
            continue
        if marker != 0x2C:
            raise MediaDecodeError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > n:
            raise MediaDecodeError("truncated GIF image descriptor")
        _left, _top, fw, fh, fpacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0:
            raise MediaDecodeError("empty GIF frame")
        total_px += fw * fh
        if total_px > _GIF_MAX_PIXELS or len(frames) >= _GIF_MAX_FRAMES:
            raise MediaDecodeError("GIF exceeds safety bounds")
        lct = gct
        if fpacked & 0x80:
            size = 3 * (2 << (fpacked & 0x07))
            if pos + size > n:
                raise MediaDecodeError("truncated GIF local color table")
            lct = np.frombuffer(blob[pos : pos + size], dtype=np.uint8).reshape(-1, 3)
            pos += size
        if pos >= n:
            raise MediaDecodeError("truncated GIF image data")
        min_code = blob[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise MediaDecodeError("invalid GIF LZW code size")
        data, pos = _gif_subblocks(blob, pos, collect=want_frames)
        frames.append(
            {
                "w": fw, "h": fh,
                "interlace": bool(fpacked & 0x40),
                "palette": lct,
                "min_code": min_code,
                "data": data if want_frames else None,
            }
        )
    if not frames:
        raise MediaDecodeError("GIF contains no frames")
    return {"width": w, "height": h, "frames": frames}


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF LZW (LSB-first variable-width codes) -> ``expected`` index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    init_len = len(table)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nacc = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nacc < width:
            if pos >= n:
                raise MediaDecodeError("GIF LZW underrun")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or len(table[code]) > 0):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise MediaDecodeError("invalid GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise MediaDecodeError("GIF LZW underrun")
    return bytes(out[:expected])


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _frame_pixels(f: dict) -> np.ndarray:
    """Decode one parsed frame record -> (fh, fw, 3) uint8 RGB."""
    if f["palette"] is None:
        raise MediaDecodeError("GIF frame has no color table")
    idx = np.frombuffer(
        _lzw_decode(f["data"], f["min_code"], f["w"] * f["h"]), dtype=np.uint8
    )
    if int(idx.max(initial=0)) >= len(f["palette"]):
        raise MediaDecodeError("GIF palette index out of range")
    rows = idx.reshape(f["h"], f["w"])
    if f["interlace"]:
        out = np.empty_like(rows)
        src = 0
        for start, step in _GIF_INTERLACE_PASSES:
            cnt = len(range(start, f["h"], step))
            out[start::step] = rows[src : src + cnt]
            src += cnt
        rows = out
    return f["palette"][rows]


def gif_pixels(blob: bytes, frame: int = 0) -> np.ndarray:
    """Full pixel decode of one frame -> (fh, fw, 3) uint8 RGB. Frames are
    decoded against their own rect + palette (no disposal compositing —
    documented subset; each frame stands alone)."""
    g = _parse_gif(blob, want_frames=True)
    if not (0 <= frame < len(g["frames"])):
        raise MediaDecodeError("GIF frame index out of range")
    return _frame_pixels(g["frames"][frame])


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Fixed-width LZW: every pixel is emitted as a literal code, with a
    Clear re-emitted before the decoder's table would force a width bump —
    valid output for ANY decoder, vectorized bit-packing via numpy."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # decoder table grows by 1 per code after the first following a Clear;
    # re-clear when it would reach (1 << width) - 1
    run = (1 << width) - clear - 2
    chunks = [indices[i : i + run] for i in range(0, len(indices), run)]
    codes: list[np.ndarray] = []
    for c in chunks:
        codes.append(np.array([clear], dtype=np.uint32))
        codes.append(c.astype(np.uint32))
    codes.append(np.array([eoi], dtype=np.uint32))
    allc = np.concatenate(codes)
    # LSB-first bit pack: (n, width) bit matrix -> flat -> bytes
    bitmat = (allc[:, None] >> np.arange(width, dtype=np.uint32)[None, :]) & 1
    flat = bitmat.astype(np.uint8).ravel()
    return np.packbits(flat, bitorder="little").tobytes()


def encode_gif_indexed(
    frames_idx: list[np.ndarray], palette: np.ndarray
) -> bytes:
    """Animated GIF89a from palette-index frames (uint8, shared dims);
    deterministic output (fixed 256-entry table, 4cs frame delay)."""
    if not frames_idx:
        raise MediaDecodeError("GIF needs at least one frame")
    if len(palette) > 256:
        raise MediaDecodeError("GIF palette too large")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    h, w = frames_idx[0].shape[:2]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += pal.tobytes()
    for idx in frames_idx:
        if idx.shape[:2] != (h, w):
            raise MediaDecodeError("GIF frames must share dimensions")
        if int(idx.max(initial=0)) >= len(palette):
            raise MediaDecodeError("GIF index outside palette")
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: 4cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # min LZW code size (256-entry table)
        data = _lzw_encode(idx.ravel(), 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _rgb_to_indices(flat: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Vectorized exact-color palette lookup (packed uint32 + searchsorted);
    raises when a color is missing from the palette."""
    pk = (
        palette[:, 0].astype(np.uint32) << 16
        | palette[:, 1].astype(np.uint32) << 8
        | palette[:, 2].astype(np.uint32)
    )
    order = np.argsort(pk)
    pk_sorted = pk[order]
    fk = (
        flat[:, 0].astype(np.uint32) << 16
        | flat[:, 1].astype(np.uint32) << 8
        | flat[:, 2].astype(np.uint32)
    )
    pos = np.searchsorted(pk_sorted, fk)
    if int(pos.max(initial=0)) >= len(pk_sorted) or not np.array_equal(
        pk_sorted[np.minimum(pos, len(pk_sorted) - 1)], fk
    ):
        raise MediaDecodeError("GIF frame color not in palette")
    return order[pos].astype(np.uint8)


def encode_gif(frames_rgb: list[np.ndarray], palette: np.ndarray) -> bytes:
    """Animated GIF89a from full-size RGB frames whose colors ALL appear in
    ``palette`` (<= 256 rows)."""
    if not frames_rgb:
        raise MediaDecodeError("GIF needs at least one frame")
    h, w = frames_rgb[0].shape[:2]
    frames_idx = []
    for fr in frames_rgb:
        if fr.shape[:2] != (h, w):
            raise MediaDecodeError("GIF frames must share dimensions")
        frames_idx.append(
            _rgb_to_indices(fr.reshape(-1, 3), np.asarray(palette)).reshape(h, w)
        )
    return encode_gif_indexed(frames_idx, np.asarray(palette))


def _decode_gif(blob: bytes) -> dict:
    g = _parse_gif(blob, want_frames=False)
    nf = len(g["frames"])
    return {
        "kind": "video" if nf > 1 else "image",
        "width": g["width"],
        "height": g["height"],
        "n_frames": nf,
        # decoded RGB bytes across frames — computable from descriptors
        "payload_bytes": sum(f["w"] * f["h"] * 3 for f in g["frames"]),
    }


_GIF_PALETTE = None


def _synth_gif_palette() -> np.ndarray:
    global _GIF_PALETTE
    if _GIF_PALETTE is None:
        # deterministic 216-color web-safe-style cube
        levels = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)
        _GIF_PALETTE = np.array(
            [(r, g, b) for r in levels for g in levels for b in levels],
            dtype=np.uint8,
        )
    return _GIF_PALETTE


def synth_gif(i: int, w: int, h: int, n_frames: int) -> bytes:
    """Deterministic animated GIF: per-frame shifting palette-index pattern
    (every color drawn from the fixed 216-color cube)."""
    pal = _synth_gif_palette()
    y, x = np.mgrid[0:h, 0:w]
    frames = [
        ((x + y * 3 + i + f * 7) % 216).astype(np.uint8) for f in range(n_frames)
    ]
    return encode_gif_indexed(frames, pal)


def resize_gif(blob: bytes, max_side: int) -> bytes:
    """Resize every frame (nearest-neighbor) and re-encode. One parse per
    blob (frames decode from the parsed records). Nearest-neighbor only
    samples existing pixels, so each frame keeps <= 256 colors; the combined
    set across frames can still exceed one table when frames carry disjoint
    LOCAL color tables, or frames may use differing rects — both valid GIFs
    this re-encoder does not reproduce (single global table, shared dims):
    they raise MediaDecodeError and surface as resize_error rows."""
    g = _parse_gif(blob, want_frames=True)
    resized = [_nn_resize(_frame_pixels(f), max_side) for f in g["frames"]]
    colors = np.unique(np.concatenate([r.reshape(-1, 3) for r in resized]), axis=0)
    if len(colors) > 256:
        raise MediaDecodeError("GIF resize: frames exceed one 256-color table")
    return encode_gif(resized, colors)
