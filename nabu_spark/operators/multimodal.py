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
  * **GIF images/animations** (87a/89a) — REAL decode: full LZW, 4-pass
    deinterlace, global/local palettes, per-frame pixel access; plus a
    deterministic encoder. Header paths parse structure only.
  * **Baseline JPEG** — REAL decode: Huffman (DC/AC), dequant, IDCT,
    chroma upsample (factors 1-2), YCbCr->RGB, grayscale; plus a 4:4:4
    encoder with the standard Annex K tables (lossy, PSNR-asserted).
  * **WAV audio** (PCM) — REAL decode: RIFF/fmt/data chunk walk; reported
    as (width=sample_rate, height=channels, n_frames=sample count).
  * **FAKE** — the deterministic synthetic format for plumbing tests:
    b"FAKE" + type(1B: 0=img,1=aud,2=vid) + width/height/n_frames (4B LE
    each) + payload bytes.
  * anything else (progressive/arithmetic JPEG, MP4, 16-bit or interlaced
    PNG...) raises NotImplementedError — the clearly-marked boundary where
    PIL/libav would plug in (not available in this container).

Everything Spark-side is format-agnostic: schema, partition-preserving
mapInPandas plumbing, Arrow batch shapes, frame sampling, and resize
propagation. Per-row decode errors become rows, never task failures.
"""

from __future__ import annotations

import hashlib
import os
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
    are REAL 8-bit RGB PNGs and id%4==1 rows REAL baseline JPEGs, video
    rows with even id are REAL animated GIFs and odd id REAL ISO-BMFF MP4s,
    audio rows with even id are REAL PCM WAVs (all exercising the native
    codecs/parsers); everything else is the FAKE plumbing format. Dimensions
    follow the same id formulas either way, so the decoded header stays
    formula-recomputable by SQL."""

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
                elif t == 0 and i % 4 == 1:
                    blob = synth_jpeg(i, w, h)
                    mime = "image/jpeg"
                elif t == 2 and i % 2 == 0:
                    # even-id video rows are REAL animated GIFs
                    blob = synth_gif(i, w, h, frames)
                    mime = "image/gif"
                elif t == 2:
                    # odd-id video rows are REAL ISO-BMFF MP4s (container
                    # metadata decode; mdat = frames x w*h-byte samples)
                    blob = synth_mp4(i, w, h, frames)
                    mime = "video/mp4"
                elif t == 1 and i % 2 == 0:
                    # even-id audio rows are REAL 16-bit mono PCM WAVs with
                    # id-formula rate/length (decoded header SQL-recomputable)
                    blob = synth_wav(i, rate=8000 + (i % 4) * 4000,
                                     n_samples=400 + (i % 50) * 16)
                    mime = "audio/wav"
                elif t == 1:
                    # odd-id audio rows are REAL Ogg/Vorbis-framed streams
                    # with the SAME rate/sample formulas as the WAV rows
                    blob = synth_ogg(i, rate=8000 + (i % 4) * 4000,
                                     n_samples=400 + (i % 50) * 16)
                    mime = "audio/ogg"
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


# --- native-codec plug-in registry (VERDICT r4 task #6) --------------------
# Same pattern as validate.full_shacl_available: detect an optional native
# imaging library at executor import and route through it, keeping the pure-
# Python kernels as the always-available fallback AND the parity oracle.
# NABU_NATIVE_CODECS selects the policy (read per call so tests can flip it):
#   auto (default) - pure kernels first; PIL only for image variants they
#                    refuse (progressive JPEG, 16-bit/interlaced PNG, WebP,
#                    TIFF, ...)
#   pil            - prefer PIL for every image blob it can open (the
#                    throughput path on a cluster with Pillow installed:
#                    C decode loops instead of Python Huffman/IDCT)
#   pure           - never use PIL (parity-oracle mode)

_PIL_CACHE: list = []


def pil_available() -> bool:
    if not _PIL_CACHE:
        try:
            from PIL import Image  # noqa: F401

            _PIL_CACHE.append(Image)
        except Exception:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0] is not None


def _codec_mode() -> str:
    return os.environ.get("NABU_NATIVE_CODECS", "auto")


def _looks_image(blob: bytes) -> bool:
    return (
        blob[:2] in (b"BM", b"\xff\xd8")
        or blob[:8] == _PNG_SIG
        or blob[:6] in (b"GIF87a", b"GIF89a")
        or (blob[:4] == b"RIFF" and blob[8:12] == b"WEBP")
        or blob[:4] in (b"II*\x00", b"MM\x00*")  # TIFF
    )


def _decode_image_pil(blob: bytes) -> dict:
    """PIL-backed decode producing the same metadata dict as the pure
    kernels, INCLUDING their per-format payload_bytes conventions (the
    decode-mode env var must never change table values): BMP counts the
    encoded pixel section with its 4-byte row padding, GIF counts
    frames * w * h * 3 decoded RGB, PNG/JPEG/others count
    w * h * bands [* frames]."""
    import io

    Image = _PIL_CACHE[0]
    try:
        with Image.open(io.BytesIO(blob)) as im:
            w, h = im.size
            bands = len(im.getbands())
            n = int(getattr(im, "n_frames", 1))
            fmt = im.format
    except Exception as e:  # PIL raises format-specific error classes
        raise MediaDecodeError(f"PIL decode failed: {e}") from e
    w, h = int(w), int(h)
    if fmt == "BMP":
        step = 4 if bands == 4 else 3
        payload = ((w * step + 3) & ~3) * h
    elif fmt == "GIF":
        payload = n * w * h * 3
    else:
        payload = w * h * bands * n
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "n_frames": n,
        "payload_bytes": payload,
    }


def _resize_image_pil(blob: bytes, max_side: int) -> bytes:
    """PIL-backed resize with the SAME target-dimension rule as
    :func:`_nn_resize` (aspect-preserving, never upscales), re-encoded in
    the source format when PIL can write it, else PNG."""
    import io

    Image = _PIL_CACHE[0]
    with Image.open(io.BytesIO(blob)) as im:
        w, h = im.size
        scale = min(1.0, max_side / max(h, w))
        tw, th = max(1, round(w * scale)), max(1, round(h * scale))
        buf = io.BytesIO()
        fmt = im.format if im.format in ("BMP", "PNG", "GIF", "JPEG") else "PNG"
        n_frames = int(getattr(im, "n_frames", 1))
        if fmt == "GIF" and n_frames > 1:
            # every frame resizes (parity with the pure resize_gif —
            # a single save() would silently drop frames 1..n)
            from PIL import ImageSequence

            frames = [f.resize((tw, th), Image.NEAREST)
                      for f in ImageSequence.Iterator(im)]
            frames[0].save(buf, format="GIF", save_all=True,
                           append_images=frames[1:])
        else:
            im.resize((tw, th), Image.NEAREST).save(buf, format=fmt)
        return buf.getvalue()


def _decode_one(blob: bytes) -> dict:
    """Dispatch on magic bytes, routed through the codec registry: the
    pure struct/numpy kernels decode natively; with Pillow importable the
    registry routes image blobs to it (always in ``pil`` mode, on
    pure-kernel NotImplementedError in ``auto`` mode); everything neither
    side can decode raises NotImplementedError — the honest plug-in
    boundary."""
    if blob is None or len(blob) < 12:
        raise MediaDecodeError("truncated media blob")
    if _codec_mode() == "pil" and pil_available() and _looks_image(blob):
        return _decode_image_pil(blob)
    try:
        return _decode_one_pure(blob)
    except NotImplementedError:
        if _codec_mode() != "pure" and pil_available() and _looks_image(blob):
            return _decode_image_pil(blob)
        raise


def _decode_one_pure(blob: bytes) -> dict:
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:4] == b"RIFF":
        if blob[8:12] == b"WEBP":
            raise NotImplementedError(
                "WebP needs an imaging library (codec registry routes to "
                "PIL when importable)")
        return _decode_wav(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        return _decode_jpeg(blob)
    if blob[4:8] == b"ftyp":
        return _decode_mp4(blob)
    if blob[:4] == b"OggS":
        return _decode_ogg(blob)
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
    """Format-dispatching pixel resize through the codec registry: each
    natively-decodable image codec re-encodes in its own format; PIL takes
    the blob when the registry prefers it or the pure kernel refuses it;
    others raise for the caller's error row."""
    if _codec_mode() == "pil" and pil_available() and _looks_image(blob):
        return _resize_image_pil(blob, max_side)
    try:
        if blob[:2] == b"BM":
            return resize_bmp(blob, max_side)
        if blob[:8] == _PNG_SIG:
            return resize_png(blob, max_side)
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            return resize_gif(blob, max_side)
        if blob[:2] == b"\xff\xd8":
            return encode_jpeg(_nn_resize(jpeg_pixels(blob), max_side))
        raise NotImplementedError(
            "this codec requires PIL/libav, not available in this container"
        )
    except NotImplementedError:
        if _codec_mode() != "pure" and pil_available() and _looks_image(blob):
            return _resize_image_pil(blob, max_side)
        raise


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
    """Frame sampling: explode (media_id, frame_idx) for every nth frame —
    JVM-side sequence. VISUAL rows only: audio has no frames (its n_frames
    reports the PCM sample count)."""
    decoded = decode_media(media).filter(
        F.col("decode_error").isNull() & (F.col("media_type") != "audio")
    )
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
    pure column math. Applies to VISUAL rows only (for audio, width/height
    report sample-rate/channels, which are not resizable dims)."""
    decoded = decode_media(media).filter(
        F.col("decode_error").isNull() & (F.col("media_type") != "audio")
    )
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


# --- native baseline JPEG codec ----------------------------------------------
# Baseline sequential DCT, 8-bit, Huffman (the overwhelming majority of web
# JPEGs). Progressive (SOF2), arithmetic coding, and 12-bit precision raise
# NotImplementedError — the honest remaining boundary. Header/lineage paths
# read only the SOF frame header; entropy decode happens in jpeg_pixels.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

_SOF_BASELINE = {0xC0, 0xC1}          # baseline + extended sequential
_SOF_UNSUPPORTED = {0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _canonical_codes(counts: list[int], syms: list[int]):
    """Canonical Huffman assignment shared by the DHT parser and the
    encoder-table builder: yields (symbol, code, length)."""
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            yield syms[k], code, length
            code += 1
            k += 1
        code <<= 1


def _dct_basis() -> np.ndarray:
    k = np.arange(8)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    return (0.5 * c[:, None] * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16))


_DCT_A = _dct_basis()  # A @ x = DCT; A.T @ X @ A ... (see use sites)


def _jpeg_headers(blob: bytes) -> dict:
    """Marker walk up to (and including) SOS; returns dims, components,
    tables, DRI, and the offset of the entropy-coded data."""
    if blob[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG")
    pos = 2
    n = len(blob)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    dri = 0
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise MediaDecodeError("JPEG marker desync")
        # optional 0xFF fill bytes before the marker code (T.81 B.1.1.2)
        while pos < n and blob[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise MediaDecodeError("truncated JPEG marker")
        marker = blob[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack_from(">H", blob, pos)[0]
        if seg_len < 2 or pos + seg_len > n:
            raise MediaDecodeError("truncated JPEG segment")
        body = blob[pos + 2 : pos + seg_len]
        # any short/garbled body below surfaces as a decode ERROR row, never
        # a struct.error/IndexError task failure

        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                "only baseline sequential Huffman JPEG is supported natively"
            )
        if marker in _SOF_BASELINE:
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + c * 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                nsym = sum(counts)
                syms = list(body[p + 17 : p + 17 + nsym])
                huff[(tc, th)] = {
                    (ln, code): sym for sym, code, ln in _canonical_codes(counts, syms)
                }
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            mapping = []
            for c in range(ns):
                cs, tt = struct.unpack_from(">BB", body, 1 + c * 2)
                mapping.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            scan = mapping
            pos += seg_len
            break
        pos += seg_len
    if frame is None or scan is None:
        raise MediaDecodeError("JPEG missing SOF/SOS")
    return {"frame": frame, "qt": qt, "huff": huff, "dri": dri,
            "scan": scan, "data_at": pos}


def _jpeg_headers_safe(blob: bytes) -> dict:
    try:
        return _jpeg_headers(blob)
    except (struct.error, IndexError) as e:
        raise MediaDecodeError(f"malformed JPEG segment: {type(e).__name__}")


def _decode_jpeg(blob: bytes) -> dict:
    j = _jpeg_headers_safe(blob)
    f = j["frame"]
    return {
        "kind": "image",
        "width": f["w"],
        "height": f["h"],
        "n_frames": 1,
        "payload_bytes": f["w"] * f["h"] * 3,  # decoded RGB bytes
    }


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise MediaDecodeError("JPEG entropy underrun")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _huff_read(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        s = table.get((length, code))
        if s is not None:
            return s
    raise MediaDecodeError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(blob: bytes) -> np.ndarray:
    """Full baseline decode -> (h, w, 3) uint8 RGB (grayscale replicated)."""
    j = _jpeg_headers_safe(blob)
    f = j["frame"]
    w, h = f["w"], f["h"]
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise MediaDecodeError("JPEG dims out of bounds")
    comps = f["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # de-stuff entropy data; stop at EOI
    raw = blob[j["data_at"]:]
    out = bytearray()
    rst_positions = []
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                rst_positions.append(len(out))
                i += 2
                continue
            break  # EOI or next segment
        out.append(b)
        i += 1
    r = _BitReader(bytes(out))
    # per-component coefficient planes (in blocks)
    planes = {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float32
        )
        for c in comps
    }
    scan_by_id = {s["id"]: s for s in j["scan"]}
    dc_pred = {c["id"]: 0 for c in comps}
    dri = j["dri"]
    n_mcu = 0
    rst_iter = iter(rst_positions)
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                r.align()
                nxt_pos = next(rst_iter, None)
                if nxt_pos is not None:
                    r.pos = nxt_pos
                    r.nbits = 0
                for cid in dc_pred:
                    dc_pred[cid] = 0
            for c in comps:
                sc = scan_by_id.get(c["id"])
                if sc is None:
                    raise NotImplementedError(
                        "non-interleaved multi-scan JPEG unsupported"
                    )
                dct = j["huff"].get((0, sc["td"]))
                act = j["huff"].get((1, sc["ta"]))
                q = j["qt"].get(c["tq"])
                if dct is None or act is None or q is None:
                    raise MediaDecodeError("JPEG missing huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = _huff_read(r, dct)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        dc_pred[c["id"]] += diff
                        coeffs[0] = dc_pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, act)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise MediaDecodeError("JPEG AC overflow")
                            coeffs[k] = _extend(r.read_bits(ss), ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float32)
                        block[_ZIGZAG] = (coeffs * q).astype(np.float32)
                        blk = block.reshape(8, 8)
                        pix = _DCT_A.T @ blk @ _DCT_A
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py : py + 8, px : px + 8] = pix
            n_mcu += 1
    # upsample to full res, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


# standard JPEG Annex K luminance/chrominance quant tables (quality ~50 base)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Annex K Huffman specs: (BITS counts list, HUFFVAL symbols)
_H_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_H_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_H_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_H_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _enc_table(spec) -> dict[int, tuple[int, int]]:
    """(counts, symbols) -> {symbol: (code, length)} (canonical codes)."""
    counts, syms = spec
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(counts, syms)}


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _dht_segment(tc: int, th: int, spec) -> bytes:
    counts, syms = spec
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(rgb: np.ndarray) -> bytes:
    """Baseline 4:4:4 JPEG with the standard Annex K tables. Lossy (quant
    error); decode(encode(x)) approximates x — asserted by PSNR in tests."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [y, cb, cr]
    qts = [_Q_LUM, _Q_CHR, _Q_CHR]
    dc_specs = [_H_DC_LUM, _H_DC_CHR, _H_DC_CHR]
    ac_specs = [_H_AC_LUM, _H_AC_CHR, _H_AC_CHR]
    dc_enc = [_enc_table(s) for s in dc_specs]
    ac_enc = [_enc_table(s) for s in ac_specs]
    bw = _BitWriter()
    dc_pred = [0, 0, 0]
    bh = -(-h // 8)
    bwid = -(-w // 8)
    # edge-replicate pad to block multiples
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        padded.append(pp)
    # precompute all quantized blocks per plane (vectorized FDCT)
    qblocks = []
    for ci, pp in enumerate(padded):
        blocks = pp.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,xyjk,lk->xyil", _DCT_A, blocks, _DCT_A)
        # _Q_LUM/_Q_CHR are the Annex K matrices in NATURAL (row-major)
        # order; zigzag applies only at the DQT serialization boundary
        qn = qts[ci].astype(np.float32).reshape(8, 8)
        qb = np.round(dct / qn).astype(np.int32)
        qblocks.append(qb)
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(3):
                blk = qblocks[ci][by, bx]
                zz = blk.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - dc_pred[ci]
                dc_pred[ci] = int(zz[0])
                t = int(diff).bit_length() if diff != 0 else 0
                code, ln = dc_enc[ci][t]
                bw.write(code, ln)
                if t:
                    v = diff if diff > 0 else diff + (1 << t) - 1
                    bw.write(v, t)
                run = 0
                last_nz = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                k = 1
                while k <= last_nz:
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        k += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[ci][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = abs(v).bit_length()
                    code, ln = ac_enc[ci][(run << 4) | s]
                    bw.write(code, ln)
                    ev = v if v > 0 else v + (1 << s) - 1
                    bw.write(ev, s)
                    run = 0
                    k += 1
                if last_nz < 63:
                    code, ln = ac_enc[ci][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    for tq, qt in ((0, _Q_LUM), (1, _Q_CHR)):
        # DQT payload is zigzag-ordered per T.81: element k = natural[ZZ[k]]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(qt[z]) for z in _ZIGZAG
        )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _H_DC_LUM) + _dht_segment(1, 0, _H_AC_LUM)
    out += _dht_segment(0, 1, _H_DC_CHR) + _dht_segment(1, 1, _H_AC_CHR)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg(i: int, w: int, h: int) -> bytes:
    """Deterministic test JPEG: smooth id-seeded gradients (JPEG-friendly
    content; the decoded payload is header-derived, so lossiness does not
    affect the contract formulas)."""
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            ((x * 255) // max(1, w - 1)).astype(np.uint8),
            ((y * 255) // max(1, h - 1)).astype(np.uint8),
            (((x + y + i) % 64) * 4).astype(np.uint8),
        ],
        axis=2,
    )
    return encode_jpeg(rgb)


# --- ISO-BMFF (MP4) header walk ----------------------------------------------
# Full video decode stays out of scope (no libav in this container), but the
# CONTAINER is plain struct data: a from-scratch box walker extracts the
# metadata multimodal curation needs — duration, per-track codec/resolution,
# sample counts, and keyframe byte offsets (sync-sample table joined through
# the sample-to-chunk map). Hostile-header-guarded like every codec here.


def _box_iter(blob: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the boxes in
    [start, end); guards against zero/overflowing sizes (no infinite walks
    on hostile headers)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(blob[pos:pos + 4], "big")
        fourcc = blob[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise MediaDecodeError("MP4 truncated largesize box")
            size = int.from_bytes(blob[pos + 8:pos + 16], "big")
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise MediaDecodeError(f"MP4 bad box size for {fourcc!r}")
        yield fourcc, pos + header, pos + size
        pos += size


def _find_box(blob: bytes, start: int, end: int, path: list[bytes]):
    """First box matching the fourcc path, as (payload_start, payload_end)."""
    for fourcc, a, b in _box_iter(blob, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return a, b
            return _find_box(blob, a, b, path[1:])
    return None


def _fullbox(blob: bytes, a: int):
    """(version, payload_start_after_version_flags) of a full box. Guarded:
    an empty/truncated full box (payload ends at the blob boundary) must
    surface as MediaDecodeError, never IndexError — decode_media only maps
    MediaDecodeError/NotImplementedError to error rows."""
    if a + 4 > len(blob):
        raise MediaDecodeError("MP4 truncated full box header")
    return blob[a], a + 4


def _parse_track(blob: bytes, a: int, b: int) -> dict | None:
    tk = _find_box(blob, a, b, [b"tkhd"])
    hd = _find_box(blob, a, b, [b"mdia", b"hdlr"])
    if tk is None or hd is None:
        return None
    ver, p = _fullbox(blob, tk[0])
    # tkhd: ver0 has 4-byte times, ver1 8-byte; width/height are the LAST
    # two 16.16 fixed-point fields of the box
    if tk[1] - tk[0] < 12:
        raise MediaDecodeError("MP4 tkhd too short")
    width = int.from_bytes(blob[tk[1] - 8:tk[1] - 4], "big") >> 16
    height = int.from_bytes(blob[tk[1] - 4:tk[1]], "big") >> 16
    # hdlr: version/flags(4) + pre_defined(4) + handler_type(4)
    handler = blob[hd[0] + 8:hd[0] + 12].decode("latin1")
    stbl = _find_box(blob, a, b, [b"mdia", b"minf", b"stbl"])
    codec = None
    n_samples = 0
    keyframes: list[int] = []
    if stbl is not None:
        sa, sb = stbl
        sd = _find_box(blob, sa, sb, [b"stsd"])
        if sd is not None and sd[1] - sd[0] >= 16:
            codec = blob[sd[0] + 12:sd[0] + 16].decode("latin1")
        sz = _find_box(blob, sa, sb, [b"stsz"])
        const_size = 0
        sizes: list[int] = []
        if sz is not None:
            _, p = _fullbox(blob, sz[0])
            if p + 8 > sz[1]:
                raise MediaDecodeError("MP4 truncated stsz header")
            const_size = int.from_bytes(blob[p:p + 4], "big")
            n_samples = int.from_bytes(blob[p + 4:p + 8], "big")
            if const_size == 0:
                need = p + 8 + 4 * n_samples
                if need > sz[1]:
                    raise MediaDecodeError("MP4 truncated stsz table")
                sizes = [
                    int.from_bytes(blob[p + 8 + 4 * j:p + 12 + 4 * j], "big")
                    for j in range(n_samples)
                ]
        ss = _find_box(blob, sa, sb, [b"stss"])
        sync: list[int] = []
        if ss is not None:
            _, p = _fullbox(blob, ss[0])
            if p + 4 > ss[1]:
                raise MediaDecodeError("MP4 truncated stss header")
            cnt = int.from_bytes(blob[p:p + 4], "big")
            if p + 4 + 4 * cnt > ss[1]:
                raise MediaDecodeError("MP4 truncated stss table")
            sync = [
                int.from_bytes(blob[p + 4 + 4 * j:p + 8 + 4 * j], "big")
                for j in range(cnt)
            ]
        co = _find_box(blob, sa, sb, [b"stco"])
        sc = _find_box(blob, sa, sb, [b"stsc"])
        if sync and co is not None and sc is not None:
            _, p = _fullbox(blob, co[0])
            if p + 4 > co[1]:
                raise MediaDecodeError("MP4 truncated stco header")
            n_chunks = int.from_bytes(blob[p:p + 4], "big")
            if p + 4 + 4 * n_chunks > co[1]:
                raise MediaDecodeError("MP4 truncated stco table")
            chunk_offs = [
                int.from_bytes(blob[p + 4 + 4 * j:p + 8 + 4 * j], "big")
                for j in range(n_chunks)
            ]
            _, p = _fullbox(blob, sc[0])
            if p + 4 > sc[1]:
                raise MediaDecodeError("MP4 truncated stsc header")
            n_ent = int.from_bytes(blob[p:p + 4], "big")
            ents = []
            for j in range(n_ent):
                q = p + 4 + 12 * j
                if q + 12 > sc[1]:
                    raise MediaDecodeError("MP4 truncated stsc table")
                ents.append((
                    int.from_bytes(blob[q:q + 4], "big"),        # first_chunk
                    int.from_bytes(blob[q + 4:q + 8], "big"),    # samples/chunk
                ))
            # expand sample -> (chunk, index-in-chunk), then byte offset
            sample_pos: dict[int, int] = {}
            sample_no = 1
            sync_set = set(sync)  # hoisted: O(1) membership in the hot loop
            for e_i, (first, per) in enumerate(ents):
                last = (
                    ents[e_i + 1][0] - 1 if e_i + 1 < len(ents) else n_chunks
                )
                for chunk in range(first, last + 1):
                    off = chunk_offs[chunk - 1] if chunk <= n_chunks else 0
                    for k in range(per):
                        if sample_no in sync_set:
                            sample_pos[sample_no] = off
                        size_k = (
                            const_size if const_size else
                            (sizes[sample_no - 1] if sample_no <= len(sizes) else 0)
                        )
                        off += size_k
                        sample_no += 1
            keyframes = [sample_pos[s] for s in sync if s in sample_pos]
    return {
        "handler": handler,
        "codec": codec,
        "width": width,
        "height": height,
        "n_samples": n_samples,
        "keyframe_offsets": keyframes,
    }


def mp4_metadata(blob: bytes) -> dict:
    """Parse an ISO-BMFF (MP4/MOV) container's metadata: brand, duration,
    per-track handler/codec/resolution/sample-count, keyframe byte offsets,
    and the mdat payload size. Pure stdlib box walk — no codec decode."""
    if len(blob) < 16 or blob[4:8] != b"ftyp":
        raise MediaDecodeError("not an ISO-BMFF file")
    end = len(blob)
    brand = blob[8:12].decode("latin1")
    mdat_bytes = 0
    for fourcc, a, b in _box_iter(blob, 0, end):
        if fourcc == b"mdat":
            mdat_bytes += b - a
    mv = _find_box(blob, 0, end, [b"moov", b"mvhd"])
    if mv is None:
        raise MediaDecodeError("MP4 missing moov/mvhd")
    ver, p = _fullbox(blob, mv[0])
    if (mv[1] - p) < (28 if ver == 1 else 16):
        raise MediaDecodeError("MP4 truncated mvhd")
    if ver == 1:
        timescale = int.from_bytes(blob[p + 16:p + 20], "big")
        duration = int.from_bytes(blob[p + 20:p + 28], "big")
    else:
        timescale = int.from_bytes(blob[p + 8:p + 12], "big")
        duration = int.from_bytes(blob[p + 12:p + 16], "big")
    moov = _find_box(blob, 0, end, [b"moov"])
    tracks = []
    for fourcc, a, b in _box_iter(blob, moov[0], moov[1]):
        if fourcc == b"trak":
            t = _parse_track(blob, a, b)
            if t is not None:
                tracks.append(t)
    return {
        "brand": brand,
        "duration_s": duration / timescale if timescale else 0.0,
        "tracks": tracks,
        "mdat_bytes": mdat_bytes,
    }


def _decode_mp4(blob: bytes) -> dict:
    m = mp4_metadata(blob)
    vid = next((t for t in m["tracks"] if t["handler"] == "vide"), None)
    if vid is None:
        raise MediaDecodeError("MP4 has no video track")
    return {
        "kind": "video",
        "width": vid["width"],
        "height": vid["height"],
        "n_frames": vid["n_samples"],
        "payload_bytes": m["mdat_bytes"],
    }


def _u32(v: int) -> bytes:
    return v.to_bytes(4, "big")


def _mp4_box(fourcc: bytes, payload: bytes) -> bytes:
    return _u32(8 + len(payload)) + fourcc + payload


def synth_mp4(i: int, w: int, h: int, n_frames: int) -> bytes:
    """Deterministic minimal-but-valid MP4: ftyp + mdat (one chunk of
    ``n_frames`` w*h-byte samples, deterministic pattern) + moov with one
    video track (mp4v sample entry, constant sample size, sync sample every
    8th frame). 25 fps timeline; byte-stable for a fixed (i, w, h, frames)."""
    sample_size = w * h
    payload = bytes(
        ((np.arange(sample_size * n_frames, dtype=np.int64) + i) % 251)
        .astype(np.uint8)
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + _u32(512) + b"isomiso2mp41")
    mdat_off = len(ftyp) + 8  # payload starts after the mdat header
    mdat = _mp4_box(b"mdat", payload)
    timescale, fps = 1000, 25
    duration = n_frames * timescale // fps
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + _u32(0) * 2 + _u32(timescale) + _u32(duration)
        + _u32(0x00010000) + b"\x01\x00" + b"\x00" * 10
        + _u32(0x00010000) + _u32(0) * 2 + _u32(0) + _u32(0x00010000) + _u32(0)
        + _u32(0) * 2 + _u32(0x40000000) + _u32(0) * 6 + _u32(2),
    )
    tkhd = _mp4_box(
        b"tkhd",
        b"\x00\x00\x00\x03" + _u32(0) * 2 + _u32(1) + _u32(0) + _u32(duration)
        + _u32(0) * 2 + b"\x00" * 8
        + _u32(0x00010000) + _u32(0) * 2 + _u32(0) + _u32(0x00010000) + _u32(0)
        + _u32(0) * 2 + _u32(0x40000000)
        + _u32(w << 16) + _u32(h << 16),
    )
    mdhd = _mp4_box(
        b"mdhd",
        b"\x00\x00\x00\x00" + _u32(0) * 2 + _u32(fps) + _u32(n_frames)
        + b"\x55\xc4\x00\x00",
    )
    hdlr = _mp4_box(
        b"hdlr",
        b"\x00\x00\x00\x00" + _u32(0) + b"vide" + _u32(0) * 3 + b"Video\x00",
    )
    entry = (
        _u32(86) + b"mp4v" + b"\x00" * 6 + b"\x00\x01"
        + b"\x00" * 16
        + w.to_bytes(2, "big") + h.to_bytes(2, "big")
        + _u32(0x00480000) + _u32(0x00480000) + _u32(0) + b"\x00\x01"
        + b"\x00" * 32 + b"\x00\x18" + b"\xff\xff"
    )
    stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00" + _u32(1) + entry)
    stts = _mp4_box(b"stts", b"\x00\x00\x00\x00" + _u32(1) + _u32(n_frames) + _u32(1))
    sync = list(range(1, n_frames + 1, 8))
    stss = _mp4_box(
        b"stss", b"\x00\x00\x00\x00" + _u32(len(sync)) + b"".join(_u32(s) for s in sync)
    )
    stsc = _mp4_box(
        b"stsc", b"\x00\x00\x00\x00" + _u32(1) + _u32(1) + _u32(n_frames) + _u32(1)
    )
    stsz = _mp4_box(b"stsz", b"\x00\x00\x00\x00" + _u32(sample_size) + _u32(n_frames))
    stco = _mp4_box(b"stco", b"\x00\x00\x00\x00" + _u32(1) + _u32(mdat_off))
    stbl = _mp4_box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    vmhd = _mp4_box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    dref = _mp4_box(
        b"dref", b"\x00\x00\x00\x00" + _u32(1) + _mp4_box(b"url ", b"\x00\x00\x00\x01")
    )
    dinf = _mp4_box(b"dinf", dref)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --- Ogg container (Vorbis/Opus identification headers) ----------------------
# Same posture as the MP4 walk: no audio decode (no libvorbis here), but the
# CONTAINER framing is plain struct data — page walk, codec identification
# from the first packet, duration from the final granule position.


def ogg_metadata(blob: bytes) -> dict:
    """Walk Ogg pages: codec (vorbis/opus from the BOS packet), channels,
    sample rate, final granule position (total samples for audio streams),
    and summed audio payload bytes. Hostile-header-guarded."""
    if blob[:4] != b"OggS":
        raise MediaDecodeError("not an Ogg stream")
    pos = 0
    codec = None
    channels = rate = None
    last_granule = 0
    payload_bytes = 0
    first = True
    header_done = False
    while pos + 27 <= len(blob):
        if blob[pos:pos + 4] != b"OggS":
            raise MediaDecodeError("Ogg page desync")
        if blob[pos + 4] != 0:
            raise MediaDecodeError("unsupported Ogg version")
        granule = int.from_bytes(blob[pos + 6:pos + 14], "little")
        n_seg = blob[pos + 26]
        seg_table = blob[pos + 27:pos + 27 + n_seg]
        if len(seg_table) < n_seg:
            raise MediaDecodeError("Ogg truncated segment table")
        body_len = sum(seg_table)
        body_start = pos + 27 + n_seg
        if body_start + body_len > len(blob):
            raise MediaDecodeError("Ogg truncated page body")
        body = blob[body_start:body_start + body_len]
        if first:
            # BOS packet: Vorbis id header or OpusHead
            if body[:7] == b"\x01vorbis" and len(body) >= 30:
                codec = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                rate = int.from_bytes(body[12:16], "little")
            else:
                raise MediaDecodeError("Ogg BOS packet is not Vorbis/Opus")
            first = False
        elif not header_done and granule == 0:
            # comment/setup header pages carry granule 0 before any audio
            # finishes — real Vorbis always has them; they are NOT payload
            pass
        else:
            header_done = True
            payload_bytes += body_len
        if granule not in (0xFFFFFFFFFFFFFFFF,):
            last_granule = max(last_granule, granule)
        pos = body_start + body_len
    if pos != len(blob):
        raise MediaDecodeError("Ogg trailing garbage")
    if codec is None:
        raise MediaDecodeError("Ogg stream with no pages")
    return {
        "codec": codec,
        "channels": int(channels),
        "sample_rate": int(rate),
        "n_samples": int(last_granule),
        "duration_s": last_granule / rate if rate else 0.0,
        "payload_bytes": int(payload_bytes),
    }


def _decode_ogg(blob: bytes) -> dict:
    m = ogg_metadata(blob)
    return {
        "kind": "audio",
        "width": m["sample_rate"],
        "height": m["channels"],
        "n_frames": m["n_samples"],
        "payload_bytes": m["payload_bytes"],
    }


def _ogg_page(serial: int, seq: int, granule: int, body: bytes,
              header_type: int = 0) -> bytes:
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    head = (
        b"OggS" + b"\x00" + bytes([header_type])
        + granule.to_bytes(8, "little") + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little") + b"\x00" * 4
        + bytes([len(segs)]) + bytes(segs)
    )
    return head + body


def synth_ogg(i: int, rate: int = 8000, n_samples: int = 400) -> bytes:
    """Deterministic Ogg/Vorbis-framed stream: BOS page with a real Vorbis
    identification header (mono, ``rate``), one audio page whose payload is
    2*n_samples deterministic bytes (16-bit-sample-sized, mirroring WAV),
    EOS granule = n_samples. The audio payload is container-framed fill, not
    encoded Vorbis packets — header/duration metadata is what decodes."""
    id_header = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([1])
        + rate.to_bytes(4, "little") + b"\x00" * 12 + b"\xb8" + b"\x01"
    )
    payload = bytes(
        ((np.arange(2 * n_samples, dtype=np.int64) + i) % 253).astype(np.uint8)
    )
    return (
        _ogg_page(i & 0x7FFFFFFF, 0, 0, id_header, header_type=2)
        + _ogg_page(i & 0x7FFFFFFF, 1, n_samples, payload, header_type=4)
    )
