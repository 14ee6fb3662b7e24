"""Minimal WKT parsing, centroid, bbox, and WKB encoding (no GEOS available).

Covers the geometry types appearing in the reference corpora: POINT,
LINESTRING, POLYGON, MULTIPOLYGON. Centroid semantics match the reference's
usage (geom.Centroid() on the parsed WKT, /root/reference/internal/mainstems/
flatgeobuf.go:41-49): area centroid for polygons, midpoint-by-length for
linestrings, the point itself for points. Invalid WKT raises ValueError and
the caller passes the document through unlinked (service.go:76-84 semantics).

WKB encoding (little-endian ISO WKB) feeds the GeoParquet sink
(/root/reference/triples_to_geoparquet/src/main.rs:30-91 builds WKB the same
way via the geozero crate).
"""

from __future__ import annotations

import re
import struct

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")


def _parse_pairs(text: str) -> list[tuple[float, float]]:
    return [(float(a), float(b)) for a, b in _PAIR_RE.findall(text)]


def parse_wkt(wkt: str) -> tuple[str, list[list[tuple[float, float]]]]:
    """Return (geom_type, rings) where rings is a list of coordinate lists.
    For POINT/LINESTRING there is a single 'ring'."""
    if not isinstance(wkt, str):
        raise ValueError("wkt must be a string")
    s = wkt.strip()
    m = re.match(r"^(POINT|LINESTRING|POLYGON|MULTIPOLYGON)\s*\(", s, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported or invalid WKT: {wkt[:80]!r}")
    gtype = m.group(1).upper()
    body = s[m.end() - 1 :]
    if gtype in ("POINT", "LINESTRING"):
        pairs = _parse_pairs(body)
        if not pairs or (gtype == "POINT" and len(pairs) != 1):
            raise ValueError(f"invalid {gtype} WKT")
        return gtype, [pairs]
    # group coordinates by innermost parenthesized ring
    rings: list[list[tuple[float, float]]] = []
    for ring_text in re.findall(r"\(([^()]+)\)", body):
        pairs = _parse_pairs(ring_text)
        if len(pairs) < 4 or pairs[0] != pairs[-1]:
            raise ValueError(f"invalid {gtype} ring")
        rings.append(pairs)
    if not rings:
        raise ValueError(f"invalid {gtype} WKT")
    return gtype, rings


def centroid(wkt: str) -> tuple[float, float]:
    gtype, rings = parse_wkt(wkt)
    if gtype == "POINT":
        return rings[0][0]
    if gtype == "LINESTRING":
        pts = rings[0]
        total_len = 0.0
        cx = cy = 0.0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            seg = ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
            total_len += seg
            cx += seg * (x1 + x2) / 2
            cy += seg * (y1 + y2) / 2
        if total_len == 0:
            return pts[0]
        return cx / total_len, cy / total_len
    # polygon / multipolygon: signed-area-weighted centroid of exterior rings
    area_sum = 0.0
    cx = cy = 0.0
    for ring in rings:
        a = 0.0
        rx = ry = 0.0
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            cross = x1 * y2 - x2 * y1
            a += cross
            rx += (x1 + x2) * cross
            ry += (y1 + y2) * cross
        if a == 0:
            continue
        area_sum += a / 2
        cx += rx / 6
        cy += ry / 6
    if area_sum == 0:
        raise ValueError("degenerate polygon (zero area)")
    return cx / area_sum, cy / area_sum


def bbox(wkt: str) -> tuple[float, float, float, float]:
    _, rings = parse_wkt(wkt)
    xs = [x for ring in rings for x, _ in ring]
    ys = [y for ring in rings for _, y in ring]
    return min(xs), min(ys), max(xs), max(ys)


_WKB_TYPE = {"POINT": 1, "LINESTRING": 2, "POLYGON": 3, "MULTIPOLYGON": 6}
_WKB_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 6: "MultiPolygon"}


def wkb_info(wkb: bytes) -> tuple[str, tuple[float, float, float, float]]:
    """(geometry type name, bbox) from little-endian ISO WKB of the subset
    this engine writes — used by the GeoParquet footer writer."""
    if not wkb or len(wkb) < 5 or wkb[0] != 1:
        raise ValueError("unsupported WKB")
    (gcode,) = struct.unpack_from("<I", wkb, 1)
    name = _WKB_TYPE_NAMES.get(gcode)
    if name is None:
        raise ValueError(f"unsupported WKB geometry code {gcode}")
    # all coordinates in our WKB subset are contiguous <dd pairs after each
    # header/count field; scan doubles by walking the structure
    coords: list[tuple[float, float]] = []

    def read_point(off):
        coords.append(struct.unpack_from("<dd", wkb, off))
        return off + 16

    def read_ring(off):
        (n,) = struct.unpack_from("<I", wkb, off)
        off += 4
        for _ in range(n):
            off = read_point(off)
        return off

    off = 5
    if gcode == 1:
        read_point(off)
    elif gcode == 2:
        read_ring(off)
    elif gcode == 3:
        (nrings,) = struct.unpack_from("<I", wkb, off)
        off += 4
        for _ in range(nrings):
            off = read_ring(off)
    else:  # multipolygon
        (npolys,) = struct.unpack_from("<I", wkb, off)
        off += 4
        for _ in range(npolys):
            off += 5  # inner byte order + type
            (nrings,) = struct.unpack_from("<I", wkb, off)
            off += 4
            for _ in range(nrings):
                off = read_ring(off)
    xs = [x for x, _ in coords]
    ys = [y for _, y in coords]
    return name, (min(xs), min(ys), max(xs), max(ys))


def wkt_to_wkb(wkt: str) -> bytes:
    gtype, rings = parse_wkt(wkt)
    buf = bytearray()
    buf.append(1)  # little-endian
    buf += struct.pack("<I", _WKB_TYPE[gtype])
    if gtype == "POINT":
        buf += struct.pack("<dd", *rings[0][0])
    elif gtype == "LINESTRING":
        buf += struct.pack("<I", len(rings[0]))
        for x, y in rings[0]:
            buf += struct.pack("<dd", x, y)
    elif gtype == "POLYGON":
        buf += struct.pack("<I", len(rings))
        for ring in rings:
            buf += struct.pack("<I", len(ring))
            for x, y in ring:
                buf += struct.pack("<dd", x, y)
    else:  # MULTIPOLYGON: one polygon per ring group (exterior-only model)
        buf += struct.pack("<I", len(rings))
        for ring in rings:
            buf.append(1)
            buf += struct.pack("<I", _WKB_TYPE["POLYGON"])
            buf += struct.pack("<I", 1)
            buf += struct.pack("<I", len(ring))
            for x, y in ring:
                buf += struct.pack("<dd", x, y)
    return bytes(buf)
