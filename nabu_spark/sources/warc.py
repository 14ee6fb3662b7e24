"""WARC source: Common-Crawl-style archives -> the ``pages`` table.

The reference crawls live (site.go:61-212); this engine reads pre-crawled
corpora (BASELINE input_hint), and the open web's pre-crawled corpus format
is WARC/1.0 — so this source turns `.warc` / `.warc.gz` archives into the
same ``pages(url, warc_ts, html, text, lang)`` table every downstream
operator consumes.

Scale shape: ``spark.read.format("binaryFile")`` gives one task per archive
file — exactly the Common-Crawl processing granularity (archives are ~1 GB
and individually gzip-membered, so they cannot be split finer without a
custom input format; a 100 TB crawl is ~100k files = ~100k tasks, ideal).
Record parsing is a ``mapInPandas`` pass emitting one row per WARC
``response`` record; malformed records are skipped, and ``warc_file_stats``
reports the per-archive skip counts (``n_skipped``) and gzip failures
(``parse_error``) as the data-loss lineage signal.

Format notes (ISO 28500 subset):
  * records: ``WARC/1.0\\r\\n`` header block, blank line, ``Content-Length``
    bytes of block, ``\\r\\n\\r\\n`` separator;
  * ``WARC-Type: response`` blocks are HTTP responses — headers split from
    the payload at the first ``\\r\\n\\r\\n``;
  * ``.warc.gz``: one gzip MEMBER per record (zlib wbits=31 loop over
    ``unused_data``) — the layout Common-Crawl ships.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "warc_file string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record CC layout)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.unused_data or d.unused_data == data:
            break
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(
    raw: bytes, state: dict | None = None
) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, block_bytes) per record; stops at garbage.

    Pass ``state`` (a dict) to learn HOW the scan ended: on exit it holds
    ``clean`` (True only when the whole archive was consumed as well-formed
    records) and ``consumed`` (bytes scanned) — the data-loss signal
    ``warc_file_stats`` reports, since a mid-archive desync silently hides
    every record after it."""
    if state is None:
        state = {}
    state["clean"] = True
    pos = 0
    n = len(raw)
    try:
        while pos < n:
            # skip inter-record padding
            while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                return
            if not raw.startswith(b"WARC/", pos):
                state["clean"] = False
                return  # desynchronized: stop rather than guess
            hdr_end = raw.find(b"\r\n\r\n", pos)
            if hdr_end == -1:
                state["clean"] = False
                return
            headers: dict[str, str] = {}
            for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                if _:
                    headers[k.decode("latin-1").strip().lower()] = (
                        v.decode("latin-1").strip()
                    )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                state["clean"] = False
                return
            if length < 0:
                state["clean"] = False
                return  # malicious/corrupt length would move pos BACKWARD
            block_start = hdr_end + 4
            if block_start + length > n:
                state["clean"] = False
                return  # truncated archive
            yield headers, raw[block_start : block_start + length]
            pos = block_start + length
    finally:
        state["consumed"] = pos


def _maybe_gunzip(fpath: str, raw: bytes) -> bytes | None:
    """Decompress when the file is gzip'd; None on corrupt streams.
    Shared by read_warc and warc_file_stats so their notion of a readable
    archive can never drift."""
    if fpath.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        try:
            return _gunzip_members(raw)
        except zlib.error:
            return None
    return raw


def _page_of(headers: dict, block: bytes) -> tuple[str, bytes] | None:
    """(url, body) when the record is an emittable page, else None — the
    single predicate both read_warc rows and warc_file_stats counts use."""
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    if not url:
        return None
    body = _response_payload(block)
    if body is None:
        return None
    return url, body


def _parse_warc_ts(v: str) -> datetime | None:
    try:
        return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def _response_payload(block: bytes) -> bytes | None:
    """HTTP response block -> body bytes (None when not a 2xx response)."""
    sep = block.find(b"\r\n\r\n")
    if sep == -1:
        return None
    status_line = block[: block.find(b"\r\n")]
    parts = status_line.split()
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None
    if not parts[1].startswith(b"2"):
        return None  # non-2xx: the reference records an error row upstream
    return block[sep + 4 :]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``pages`` rows (plus ``warc_file`` provenance) from WARC archives.

    ``path`` may glob (``/data/cc/*.warc.gz``). ``text``/``lang`` are empty —
    they are downstream-derived columns in this corpus layout."""
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.warc*"
    ).load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls, fnames = [], [], [], []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = _maybe_gunzip(fpath, bytes(content))
                if raw is None:
                    continue  # corrupt archive -> zero rows for the file
                for headers, block in iter_warc_records(raw):
                    page = _page_of(headers, block)
                    if page is None:
                        continue
                    urls.append(page[0])
                    tss.append(_parse_warc_ts(headers.get("warc-date", "")))
                    htmls.append(page[1])
                    fnames.append(fpath)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(tss, dtype="object"),
                    "html": pd.Series(htmls, dtype="object"),
                    "text": pd.Series([""] * len(urls), dtype="object"),
                    "lang": pd.Series([""] * len(urls), dtype="object"),
                    "warc_file": pd.Series(fnames, dtype="object"),
                }
            )

    return files.mapInPandas(parse, WARC_PAGES_SCHEMA)


def warc_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-archive lineage: (warc_file, n_records, n_pages, n_skipped,
    parse_error). ``n_skipped`` counts records present in the archive that
    produced no page row (non-response types, missing target URI, non-2xx,
    malformed HTTP block); ``parse_error`` marks archives whose gzip stream
    failed to decode OR whose record scan ended before clean EOF (desync /
    truncation) — in both cases rows are silently missing downstream, which
    is exactly what this signal exists to surface."""
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.warc*"
    ).load(path).select("path", "content")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "warc_file": [], "n_records": [], "n_pages": [],
                "n_skipped": [], "parse_error": [],
            }
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = _maybe_gunzip(fpath, bytes(content))
                err = raw is None
                n_records = n_pages = 0
                if not err:
                    scan: dict = {}
                    for headers, block in iter_warc_records(raw, scan):
                        n_records += 1
                        if _page_of(headers, block) is not None:
                            n_pages += 1
                    err = not scan["clean"]
                out["warc_file"].append(fpath)
                out["n_records"].append(n_records)
                out["n_pages"].append(n_pages)
                out["n_skipped"].append(n_records - n_pages)
                out["parse_error"].append(err)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        stats,
        "warc_file string, n_records long, n_pages long, n_skipped long, "
        "parse_error boolean",
    )


# --- deterministic fixture writer (datagen companion; no external data) ------


def write_warc_fixture(
    path: str, n_pages: int, *, gzip_members: bool = False, start: int = 0
) -> list[tuple[int, str]]:
    """Serialize ``datagen.page_for`` pages into a spec-shaped WARC file so
    the source can be tested end-to-end against known content. Returns the
    (byte_offset, url) of each record — the CDX-index view of the file."""
    import gzip as _gzip
    import io

    from ..datagen import page_for

    out = io.BytesIO()
    offsets: list[tuple[int, str]] = []
    for i in range(start, start + n_pages):
        p = page_for(i)
        offsets.append((out.tell(), p["url"]))
        body = p["html"]
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        ts = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + p["url"].encode() + b"\r\n"
            b"WARC-Date: " + ts.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n"
        )
        if gzip_members:
            out.write(_gzip.compress(rec, mtime=0))
        else:
            out.write(rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return offsets


def _record_at_offset(raw: bytes, offset: int, gzipped: bool) -> tuple[dict, bytes] | None:
    """Parse the single WARC record starting at ``offset``: for the
    Common-Crawl layout each record is its own gzip member, so a member
    decompression (zlib wbits=31 stops at the member boundary) yields
    exactly one record; uncompressed archives parse in place."""
    import zlib

    if offset < 0 or offset >= len(raw):
        return None
    if gzipped:
        try:
            d = zlib.decompressobj(wbits=31)
            rec = d.decompress(raw[offset:])
        except zlib.error:
            return None
    else:
        rec = raw[offset:]
    return next(iter_warc_records(rec), None)


def fetch_from_plan(spark: SparkSession, plan: DataFrame, warc_dir: str) -> DataFrame:
    """Execute a CDX fetch plan (``cdx.fetch_plan``: filename + sorted
    offsets) against a directory of WARC archives: one binaryFile task per
    archive (the Common-Crawl ~1 GB granularity), offsets visited in
    ascending order, one page row per fetched record.

    The plan side is index-derived and tiny next to the archives, so it
    broadcasts; rows whose offset does not hold a response record surface
    as error rows (url null, error set) — lineage, not task failures. On
    real object storage the per-offset reads become range GETs; in Spark's
    binaryFile model the archive is the task's input split either way."""
    if dict(plan.dtypes).get("offsets", "").startswith("array"):
        # fetch_plan's native shape: serialize to the comma form the Arrow
        # stage parses (a bare string cast would render '[1, 2]')
        off_str = F.concat_ws(
            ",", F.transform("offsets", lambda x: x.cast("string"))
        )
    else:
        off_str = F.col("offsets").cast("string")
    plan_small = plan.select(F.col("filename"), off_str.alias("_offsets"))
    files = spark.read.format("binaryFile").load(f"{warc_dir}/*")
    joined = files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
        "content",
    ).join(F.broadcast(plan_small), "filename")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("url", "warc_ts", "html", "filename", "offset", "error")}
            for fname, content, offsets_s in zip(
                pdf["filename"], pdf["content"], pdf["_offsets"]
            ):
                raw = bytes(content)
                gzipped = raw[:2] == b"\x1f\x8b"
                offs = [int(x) for x in str(offsets_s).split(",") if x != ""]
                for off in sorted(offs):
                    rec = _record_at_offset(raw, off, gzipped)
                    page = _page_of(*rec) if rec is not None else None
                    out["filename"].append(fname)
                    out["offset"].append(off)
                    if rec is None or page is None:
                        out["url"].append(None)
                        out["warc_ts"].append(None)
                        out["html"].append(None)
                        out["error"].append(
                            "bad_offset" if rec is None else "not_a_response"
                        )
                        continue
                    url, body = page
                    out["url"].append(url)
                    out["warc_ts"].append(
                        _parse_warc_ts(rec[0].get("warc-date", ""))
                    )
                    out["html"].append(body)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        fetch,
        "url string, warc_ts timestamp, html binary, "
        "filename string, offset long, error string",
    )
