"""FlatGeobuf reader (and fixture writer) for the mainstem dictionary.

The reference loads its mainstem spatial dictionary from a FlatGeobuf file
(internal/mainstems/flatgeobuf.go:55-65 reads ``colorado_subset.fgb`` via
DuckDB spatial and selects ``geoconnex_url`` by bbox). The repo's
:func:`nabu_spark.operators.enrich.mainstem_join` consumes a broadcast
DataFrame of (geoconnex_url, minx, miny, maxx, maxy) — this module closes
the format gap: :func:`read_flatgeobuf` parses a .fgb file driver-side
(the dictionary is vocabulary-sized by design; the 100-TB side of the join
is the docs table, never the dictionary) into exactly that DataFrame, plus
a WKT rendering of each geometry.

The parser is a from-scratch implementation of the PUBLIC FlatGeobuf 3.x
layout (https://flatgeobuf.org — magic, size-prefixed flatbuffers header,
optional packed Hilbert R-tree, size-prefixed feature records) on top of a
minimal generic flatbuffers table reader (vtable-walking, so files written
by GDAL/other writers with different field layouts parse correctly).
:func:`write_flatgeobuf` is the matching writer — used for fixtures
mirroring colorado_subset.fgb and as a small-dictionary sink.

No code is taken from the flatbuffers or flatgeobuf projects; the wire
format is implemented from the published specification.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC = b"fgb\x03fgb\x01"

# FlatGeobuf GeometryType enum (spec: fbs/header.fbs)
GT_UNKNOWN = 0
GT_POINT = 1
GT_LINESTRING = 2
GT_POLYGON = 3
GT_MULTIPOINT = 4
GT_MULTILINESTRING = 5
GT_MULTIPOLYGON = 6

# FlatGeobuf ColumnType enum (spec order)
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT, CT_INT, CT_UINT, \
    CT_LONG, CT_ULONG, CT_FLOAT, CT_DOUBLE, CT_STRING, CT_JSON, \
    CT_DATETIME, CT_BINARY = range(15)

_SCALAR_FMT = {
    CT_BYTE: ("<b", 1), CT_UBYTE: ("<B", 1), CT_BOOL: ("<B", 1),
    CT_SHORT: ("<h", 2), CT_USHORT: ("<H", 2), CT_INT: ("<i", 4),
    CT_UINT: ("<I", 4), CT_LONG: ("<q", 8), CT_ULONG: ("<Q", 8),
    CT_FLOAT: ("<f", 4), CT_DOUBLE: ("<d", 8),
}


# ---------------------------------------------------------------------------
# minimal generic flatbuffers reading (vtable walk)
# ---------------------------------------------------------------------------

class _Table:
    """Random access into one flatbuffers table: ``pos`` is the absolute
    offset of the table start (where the signed vtable offset lives)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos

    def _field_pos(self, idx: int) -> int:
        """Absolute position of field ``idx``'s data, or 0 if absent."""
        soffset = struct.unpack_from("<i", self.buf, self.pos)[0]
        vtable = self.pos - soffset
        vsize = struct.unpack_from("<H", self.buf, vtable)[0]
        slot = 4 + 2 * idx
        if slot + 2 > vsize:
            return 0
        rel = struct.unpack_from("<H", self.buf, vtable + slot)[0]
        return self.pos + rel if rel else 0

    def scalar(self, idx: int, fmt: str, default):
        p = self._field_pos(idx)
        if not p:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def _indirect(self, idx: int) -> int:
        """Absolute position of a referenced object (string/vector/table)."""
        p = self._field_pos(idx)
        if not p:
            return 0
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, idx: int) -> str | None:
        p = self._indirect(idx)
        if not p:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4:p + 4 + n].decode("utf-8")

    def vector(self, idx: int) -> tuple[int, int]:
        """(absolute position of element 0, element count); (0, 0) if absent."""
        p = self._indirect(idx)
        if not p:
            return 0, 0
        n = struct.unpack_from("<I", self.buf, p)[0]
        return p + 4, n

    def vector_f64(self, idx: int) -> list[float]:
        p, n = self.vector(idx)
        return list(struct.unpack_from(f"<{n}d", self.buf, p)) if n else []

    def vector_u32(self, idx: int) -> list[int]:
        p, n = self.vector(idx)
        return list(struct.unpack_from(f"<{n}I", self.buf, p)) if n else []

    def table(self, idx: int) -> "_Table | None":
        p = self._indirect(idx)
        return _Table(self.buf, p) if p else None

    def table_vector(self, idx: int) -> list["_Table"]:
        p, n = self.vector(idx)
        out = []
        for i in range(n):
            ep = p + 4 * i
            out.append(_Table(self.buf,
                              ep + struct.unpack_from("<I", self.buf, ep)[0]))
        return out


def _root(buf: bytes) -> _Table:
    return _Table(buf, struct.unpack_from("<I", buf, 0)[0])


# ---------------------------------------------------------------------------
# FlatGeobuf parsing
# ---------------------------------------------------------------------------

def _packed_rtree_size(num_items: int, node_size: int) -> int:
    """Size in bytes of the packed Hilbert R-tree section (spec: 40-byte
    nodes — 4 float64 bbox + uint64 offset — over the bottom-up level
    sequence). The level loop is a DO-while per the reference algorithm:
    even a single-feature index has a root ABOVE the leaf level (2 nodes,
    80 bytes), so the parent level is computed at least once."""
    node_size = max(int(node_size), 2)
    n = num_items
    num_nodes = n
    while True:
        n = (n + node_size - 1) // node_size
        num_nodes += n
        if n == 1:
            break
    return num_nodes * 40


def _parse_properties(blob: bytes, columns: list[tuple[str, int]]) -> dict:
    """Decode the per-feature properties byte blob: repeated
    (uint16 column-index, value) with the value wire-encoded per the
    column's declared type (strings/json/datetime/binary are u32
    length-prefixed)."""
    out: dict = {}
    pos, end = 0, len(blob)
    while pos + 2 <= end:
        (ci,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        if ci >= len(columns):
            break  # malformed row: stop rather than misalign
        name, ctype = columns[ci]
        if ctype in _SCALAR_FMT:
            fmt, width = _SCALAR_FMT[ctype]
            (v,) = struct.unpack_from(fmt, blob, pos)
            pos += width
            out[name] = bool(v) if ctype == CT_BOOL else v
        else:  # length-prefixed payloads
            (n,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            raw = blob[pos:pos + n]
            pos += n
            out[name] = raw if ctype == CT_BINARY else raw.decode("utf-8")
    return out


def _pairs(xy: list[float]) -> list[tuple[float, float]]:
    return [(xy[i], xy[i + 1]) for i in range(0, len(xy), 2)]


def _ring_slices(xy: list[float], ends: list[int]) -> list[list[tuple]]:
    """Split a coordinate list by the ``ends`` vector (end indices in
    COORDINATE pairs, cumulative, per spec)."""
    pts = _pairs(xy)
    if not ends:
        return [pts]
    out, start = [], 0
    for e in ends:
        out.append(pts[start:e])
        start = e
    return out


def _fmt_num(v: float) -> str:
    return repr(int(v)) if float(v).is_integer() else repr(v)


def _wkt(geom_type: int, xy: list[float], ends: list[int]) -> str:
    def coords(pts):
        return ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in pts)

    if geom_type == GT_POINT:
        x, y = xy[0], xy[1]
        return f"POINT ({_fmt_num(x)} {_fmt_num(y)})"
    if geom_type == GT_LINESTRING:
        return f"LINESTRING ({coords(_pairs(xy))})"
    if geom_type == GT_POLYGON:
        rings = _ring_slices(xy, ends)
        inner = ", ".join(f"({coords(r)})" for r in rings)
        return f"POLYGON ({inner})"
    if geom_type == GT_MULTIPOINT:
        return f"MULTIPOINT ({coords(_pairs(xy))})"
    if geom_type == GT_MULTILINESTRING:
        parts = _ring_slices(xy, ends)
        inner = ", ".join(f"({coords(p)})" for p in parts)
        return f"MULTILINESTRING ({inner})"
    raise ValueError(f"unsupported FlatGeobuf geometry type {geom_type}")


@dataclass
class FgbFeature:
    properties: dict
    wkt: str
    bbox: tuple[float, float, float, float]


@dataclass
class FgbFile:
    name: str | None
    geometry_type: int
    columns: list[tuple[str, int]]
    features: list[FgbFeature] = field(default_factory=list)


def parse_flatgeobuf(data: bytes) -> FgbFile:
    """Parse a FlatGeobuf byte string: magic, header (name, geometry type,
    columns, feature count, index node size), skip the optional packed
    R-tree, then decode every size-prefixed Feature record (geometry xy/
    ends + properties blob)."""
    if len(data) < 8 or data[0:3] != b"fgb" or data[4:7] != b"fgb":
        raise ValueError("not a FlatGeobuf file (bad magic)")
    pos = 8
    (hsize,) = struct.unpack_from("<I", data, pos)
    pos += 4
    header = _root(data[pos:pos + hsize])
    pos += hsize

    name = header.string(0)
    geometry_type = header.scalar(2, "<B", GT_UNKNOWN)
    columns = [(c.string(0) or "", c.scalar(1, "<B", CT_STRING))
               for c in header.table_vector(7)]
    features_count = header.scalar(8, "<Q", 0)
    index_node_size = header.scalar(9, "<H", 16)

    if index_node_size > 0 and features_count > 0:
        pos += _packed_rtree_size(features_count, index_node_size)

    out = FgbFile(name=name, geometry_type=geometry_type, columns=columns)
    while pos + 4 <= len(data):
        (fsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        feat = _root(data[pos:pos + fsize])
        pos += fsize
        geom = feat.table(0)
        if geom is None:
            continue
        gtype = geom.scalar(6, "<B", 0) or geometry_type
        xy = geom.vector_f64(1)
        if not xy:
            continue  # empty geometry: nothing to index spatially
        ends = geom.vector_u32(0)
        props_pos, props_n = feat.vector(1)
        blob = feat.buf[props_pos:props_pos + props_n] if props_n else b""
        xs, ys = xy[0::2], xy[1::2]
        out.features.append(FgbFeature(
            properties=_parse_properties(bytes(blob), columns),
            wkt=_wkt(gtype, xy, ends),
            bbox=(min(xs), min(ys), max(xs), max(ys)),
        ))
    return out


def read_flatgeobuf(spark, path: str, *, url_column: str = "geoconnex_url"):
    """Load a .fgb mainstem dictionary into the broadcast-dictionary shape
    :func:`nabu_spark.operators.enrich.mainstem_join` consumes:
    (geoconnex_url, minx, miny, maxx, maxy, wkt). Driver-side parse by
    design — the dictionary side of the mainstem join is vocabulary-sized
    (flatgeobuf.go:55-65 holds it in one DuckDB instance); the scan side
    stays distributed."""
    with open(path, "rb") as fh:
        fgb = parse_flatgeobuf(fh.read())
    rows = []
    for f in fgb.features:
        url = f.properties.get(url_column)
        rows.append((None if url is None else str(url),
                     *[float(v) for v in f.bbox], f.wkt))
    return spark.createDataFrame(
        rows,
        f"{url_column} string, minx double, miny double, "
        "maxx double, maxy double, wkt string",
    )


# ---------------------------------------------------------------------------
# writer (fixtures + small-dictionary sink)
# ---------------------------------------------------------------------------

class _Builder:
    """Forward-building flatbuffers encoder with deferred offset patching
    (children are appended after their parents; every stored uoffset is
    patched to ``target - field_pos``, which the spec requires to point
    forward)."""

    def __init__(self):
        self.buf = bytearray()
        self._patches: list[tuple[int, int]] = []  # (field_pos, target_id)
        self._targets: dict[int, int] = {}
        self._next_id = 0

    def _align(self, n: int) -> None:
        while len(self.buf) % n:
            self.buf.append(0)

    def put(self, fmt: str, *vals) -> int:
        self._align(struct.calcsize(fmt))
        pos = len(self.buf)
        self.buf += struct.pack(fmt, *vals)
        return pos

    def ref_slot(self) -> int:
        """Reserve a u32 uoffset slot; returns a target id to bind later."""
        self._align(4)
        tid = self._next_id
        self._next_id += 1
        self._patches.append((len(self.buf), tid))
        self.buf += b"\x00\x00\x00\x00"
        return tid

    def bind(self, tid: int) -> None:
        self._targets[tid] = len(self.buf)

    def string(self, tid: int, s: str) -> None:
        raw = s.encode("utf-8")
        self._align(4)
        self.bind(tid)
        self.buf += struct.pack("<I", len(raw)) + raw + b"\x00"

    def finish(self) -> bytes:
        for pos, tid in self._patches:
            struct.pack_into("<I", self.buf, pos,
                             self._targets[tid] - pos)
        return bytes(self.buf)


def _vtable_and_table(b: _Builder, fields: list[tuple[int, str, object]],
                      refs: list[int]) -> None:
    """Emit one table whose PRESENT fields are ``fields``: a list of
    (field_index, kind, value) where kind is a struct format for inline
    scalars or "ref" for a uoffset slot (value then receives the reserved
    target id via the ``refs`` out-list). Field data is laid out in the
    given order; the vtable is emitted immediately before the table."""
    max_idx = max(i for i, _, _ in fields)
    nslots = max_idx + 1
    # lay out field data offsets relative to table start: soffset(4 bytes)
    # first, then fields in given order with natural alignment
    sizes = {"ref": 4}
    offs: dict[int, int] = {}
    cur = 4
    for idx, kind, _ in fields:
        w = sizes.get(kind) or struct.calcsize(kind)
        cur = (cur + w - 1) // w * w
        offs[idx] = cur
        cur += w
    table_size = cur
    vsize = 4 + 2 * nslots
    b._align(2)
    vtable_pos = len(b.buf)
    b.buf += struct.pack("<HH", vsize, table_size)
    for i in range(nslots):
        b.buf += struct.pack("<H", offs.get(i, 0))
    # table: must start 4-aligned (soffset is i32)
    b._align(4)
    table_pos = len(b.buf)
    b.buf += struct.pack("<i", table_pos - vtable_pos)
    # write field data in layout order, padding to each field's offset
    for idx, kind, val in sorted(fields, key=lambda f: offs[f[0]]):
        while len(b.buf) < table_pos + offs[idx]:
            b.buf.append(0)
        if kind == "ref":
            tid = b.ref_slot()
            refs.append(tid)
            if callable(val):
                val(tid)
        else:
            b.buf += struct.pack(kind, val)
    while len(b.buf) < table_pos + table_size:
        b.buf.append(0)
    return table_pos


def _build_header(name: str, geometry_type: int,
                  columns: list[tuple[str, int]], n_features: int) -> bytes:
    b = _Builder()
    root = b.ref_slot()  # buffer-start root uoffset
    refs: list[int] = []
    pending: list[tuple[int, str]] = []  # (tid, string) to emit late

    def set_name(tid):
        pending.append((tid, name))

    col_vec_tid: list[int] = []

    def set_columns(tid):
        col_vec_tid.append(tid)

    b.bind(root)  # root table comes right after the root offset...
    # ...but the vtable must precede the table; emit vtable+table now and
    # re-bind root to the actual table position
    fields = [
        (0, "ref", set_name),
        (2, "<B", geometry_type),
        (7, "ref", set_columns),
        (8, "<Q", n_features),
        (9, "<H", 0),  # index_node_size=0: no packed R-tree section
    ]
    table_pos = _vtable_and_table(b, fields, refs)
    b._targets[root] = table_pos
    # children: columns vector -> column tables -> strings
    b._align(4)
    b.bind(col_vec_tid[0])
    b.buf += struct.pack("<I", len(columns))
    elem_tids = [b.ref_slot() for _ in columns]
    for (cname, ctype), tid in zip(columns, elem_tids):
        crefs: list[int] = []
        cpend: list[tuple[int, str]] = []
        cpos = _vtable_and_table(
            b,
            [(0, "ref", lambda t, s=cname: cpend.append((t, s))),
             (1, "<B", ctype)],
            crefs)
        b._targets[tid] = cpos
        for t, s in cpend:
            b.string(t, s)
    for tid, s in pending:
        b.string(tid, s)
    return b.finish()


def _build_feature(geometry_type: int, xy: list[float], ends: list[int],
                   props: bytes) -> bytes:
    b = _Builder()
    root = b.ref_slot()
    geom_tid: list[int] = []
    props_tid: list[int] = []
    fpos = _vtable_and_table(
        b,
        [(0, "ref", lambda t: geom_tid.append(t)),
         (1, "ref", lambda t: props_tid.append(t))],
        [])
    b._targets[root] = fpos
    # geometry table
    ends_tid: list[int] = []
    xy_tid: list[int] = []
    gfields: list[tuple[int, str, object]] = []
    if ends:
        gfields.append((0, "ref", lambda t: ends_tid.append(t)))
    gfields.append((1, "ref", lambda t: xy_tid.append(t)))
    gfields.append((6, "<B", geometry_type))
    gpos = _vtable_and_table(b, gfields, [])
    b._targets[geom_tid[0]] = gpos
    if ends:
        b._align(4)
        b.bind(ends_tid[0])
        b.buf += struct.pack(f"<I{len(ends)}I", len(ends), *ends)
    # double vector elements must be 8-aligned; the u32 length sits right
    # before element 0, so align to 8 AFTER accounting for the 4-byte length
    while (len(b.buf) + 4) % 8:
        b.buf.append(0)
    b.bind(xy_tid[0])
    b.buf += struct.pack("<I", len(xy)) + struct.pack(f"<{len(xy)}d", *xy)
    b._align(4)
    b.bind(props_tid[0])
    b.buf += struct.pack("<I", len(props)) + props
    return b.finish()


def _encode_properties(values: list, columns: list[tuple[str, int]]) -> bytes:
    out = bytearray()
    for i, ((_, ctype), v) in enumerate(zip(columns, values)):
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ctype in _SCALAR_FMT:
            fmt, _ = _SCALAR_FMT[ctype]
            out += struct.pack(fmt, int(v) if ctype == CT_BOOL else v)
        else:
            raw = v if isinstance(v, bytes) else str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def write_flatgeobuf(path: str, features: list[dict], *,
                     name: str = "mainstems",
                     geometry_type: int = GT_LINESTRING,
                     columns: list[tuple[str, int]] | None = None) -> None:
    """Write a FlatGeobuf file. ``features`` rows are dicts with ``xy``
    (flat [x0, y0, x1, y1, ...]), optional ``ends``, and one entry per
    declared column. No spatial index is written (index_node_size=0) — the
    repo's consumer is a full-scan broadcast-dictionary load, and readers
    that do use the index (DuckDB spatial) treat it as optional."""
    if columns is None:
        columns = [("geoconnex_url", CT_STRING)]
    buf = bytearray(MAGIC)
    header = _build_header(name, geometry_type, columns, len(features))
    buf += struct.pack("<I", len(header)) + header
    for f in features:
        props = _encode_properties([f.get(c) for c, _ in columns], columns)
        rec = _build_feature(f.get("geometry_type", geometry_type),
                             f["xy"], f.get("ends", []), props)
        buf += struct.pack("<I", len(rec)) + rec
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
