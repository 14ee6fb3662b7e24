"""Deterministic synthetic corpus generator (FIXTURES.md schemas, seed=42).

Generates the Common-Crawl-style ``pages`` table plus the ``sitemaps``,
``mainstems``, and ``known_iris`` dimensions. Every value is a pure function
of the row id (hashes, no RNG state), so any scale regenerates identically
and distributed generation is embarrassingly parallel.

Document templates model the reference's fixtures (SURVEY.md §5):
  a. schema:Place with geo + gsp WKT  (gage_jsonld.jsonld shape)
  b. schema:Dataset with provider subtree
  c. hyf mainstem chain (multi-hop join path, triples_lib.rs:225-230 shape)
plus invalid variants (no @type / missing jsonld / malformed HTML / raw
ld+json bodies / wrong-MIME) with the mix of getJSONLD dispatch
(/root/reference/internal/crawl/site.go:32-50).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

SEED = 42
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

N_HOSTS = 50
# Zipf-skewed host weights: host 0 is the mega-host (skew handling tests)
_HOST_CUM = []
_total = 0.0
for i in range(N_HOSTS):
    _total += 1.0 / (i + 1)
    _HOST_CUM.append(_total)
_HOST_CUM = [c / _total for c in _HOST_CUM]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _h(i: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"{SEED}:{salt}:{i}".encode()).digest()[:8], "big"
    )


def _uniform(i: int, salt: str) -> float:
    return _h(i, salt) / 2**64


def _host_for(i: int) -> str:
    u = _uniform(i, "host")
    for idx, c in enumerate(_HOST_CUM):
        if u <= c:
            return f"host{idx:03d}.example.org"
    return f"host{N_HOSTS - 1:03d}.example.org"


def _coords(i: int) -> tuple[float, float]:
    # spread points over a Colorado-ish bbox so a known subset falls inside
    # known mainstem polygons
    lon = -109.0 + 7.0 * _uniform(i, "lon")
    lat = 37.0 + 4.0 * _uniform(i, "lat")
    return round(lon, 7), round(lat, 7)


def _context_variant(i: int) -> object:
    v = _h(i, "ctx") % 3
    base = {
        "schema": "https://schema.org/",
        "gsp": "http://www.opengis.net/ont/geosparql#",
        "hyf": "https://www.opengis.net/def/schema/hy_features/hyf/",
        "name": "schema:name",
        "description": "schema:description",
        "geo": "schema:geo",
        "provider": {"@id": "schema:provider", "@type": "@id"},
    }
    if v == 1:  # non-canonical schema.org — exercises standardization
        base = dict(base)
        base["schema"] = "http://schema.org"
    if v == 2:  # non-canonical hyf
        base = dict(base)
        base["hyf"] = "https://www.opengis.net/def/appschema/hy_features/hyf"
    return [base]


def make_place_doc(i: int) -> dict:
    lon, lat = _coords(i)
    return {
        "@context": _context_variant(i),
        "@id": f"https://geoconnex.us/iow/demo/site-{i}",
        "@type": "schema:Place",
        "name": f"MONITORING SITE {i}",
        "description": f"Synthetic monitoring location {i}",
        "provider": "https://waterdata.usgs.gov",
        "geo": {
            "@type": "schema:GeoCoordinates",
            "schema:longitude": lon,
            "schema:latitude": lat,
        },
        "gsp:hasGeometry": {
            "@type": "http://www.opengis.net/ont/sf#Point",
            "gsp:asWKT": {
                "@type": "http://www.opengis.net/ont/geosparql#wktLiteral",
                "@value": f"POINT ({lon} {lat})",
            },
        },
    }


def make_dataset_doc(i: int) -> dict:
    return {
        "@context": _context_variant(i),
        "@id": f"https://geoconnex.us/iow/demo/dataset-{i}",
        "@type": "schema:Dataset",
        "name": f"Dataset {i}",
        "description": f"Synthetic dataset {i}",
        "provider": {
            "@type": "schema:Organization",
            "name": f"Org {i % 17}",
            "schema:url": {"@id": f"https://org{i % 17}.example.org"},
        },
    }


def make_hyf_doc(i: int) -> dict:
    mainstem = 36800 + (i % 64)
    doc = make_place_doc(i)
    doc["hyf:referencedPosition"] = [
        {
            "hyf:HY_IndirectPosition": {
                "hyf:distanceDescription": {"hyf:HY_DistanceDescription": "upstream"},
                "hyf:interpolative": 40.0 + (i % 100) + 0.1368,
                "hyf:linearElement": {
                    "@id": f"https://geoconnex.us/ref/mainstems/{mainstem}"
                },
            }
        }
    ]
    return doc


def make_invalid_doc(i: int) -> dict:
    # SHACL-invalid shape: no @type, no geometry; still valid JSON-LD
    return {
        "@context": _context_variant(i),
        "@id": f"https://geoconnex.us/iow/demo/untyped-{i}",
        "name": f"untyped {i}",
    }


def microdata_html_for(i: int, doc: dict) -> str:
    """Microdata rendering of a place doc (JSON-LD-free page)."""
    subj = doc["@id"]
    lon, lat = _coords(i)
    return (
        "<!DOCTYPE html><html><head><title>md site</title></head><body>"
        f'<div itemscope itemtype="https://schema.org/Place" itemid="{subj}">'
        f'<h1 itemprop="name">{doc["name"]}</h1>'
        f'<meta itemprop="description" content="{doc["description"]}">'
        '<div itemprop="geo" itemscope itemtype="https://schema.org/GeoCoordinates">'
        f'<meta itemprop="latitude" content="{lat}">'
        f'<meta itemprop="longitude" content="{lon}"></div>'
        "</div></body></html>"
    )


def rdfa_html_for(i: int, doc: dict) -> str:
    """RDFa Lite rendering of a place doc."""
    subj = doc["@id"]
    return (
        '<!DOCTYPE html><html><body vocab="https://schema.org/">'
        f'<div about="{subj}" typeof="Place">'
        f'<span property="name">{doc["name"]}</span>'
        f'<meta property="description" content="{doc["description"]}">'
        "</div></body></html>"
    )


def page_for(i: int, structured_fraction: float = 0.0) -> dict:
    host = _host_for(i)
    url = f"https://{host}/iow/demo/{i}"
    mode = _uniform(i, "mode")
    kind = _uniform(i, "kind")
    if structured_fraction and _uniform(i, "structured") < structured_fraction:
        doc = make_place_doc(i)
        html = (
            microdata_html_for(i, doc)
            if _uniform(i, "sdkind") < 0.5
            else rdfa_html_for(i, doc)
        )
        ts = EPOCH + timedelta(minutes=i % 525600)
        return {"url": url, "warc_ts": ts, "html": html.encode(), "text": "", "lang": "en"}
    if kind < 0.55:
        doc = make_place_doc(i)
    elif kind < 0.75:
        doc = make_dataset_doc(i)
    elif kind < 0.92:
        doc = make_hyf_doc(i)
    else:
        doc = make_invalid_doc(i)
    doc_text = json.dumps(doc, indent=1)
    lang = "en" if _uniform(i, "lang") < 0.9 else ("es" if _uniform(i, "lang") < 0.95 else "fr")
    ts = EPOCH + timedelta(minutes=i % 525600)

    if mode < 0.70:
        # HTML-embedded (with noise scripts and, sometimes, messy markup)
        noise = '<script type="text/javascript">var x = 1 < 2;</script>'
        messy = _uniform(i, "messy") < 0.02
        head_open = "<head>" if not messy else ""  # implied head
        html = (
            "<!DOCTYPE html>\n<html>\n" + head_open
            + f'<meta charset="utf-8">{noise}<title>site {i}</title>\n'
            + f'<script language="" type="application/ld+json">{doc_text}</script>\n'
            + ("</head>" if not messy else "")
            + f"<body><h1>Site {i}</h1><p>synthetic page</p></body></html>\n"
        )
        return {"url": url, "warc_ts": ts, "html": html.encode(), "text": doc_text, "lang": lang}
    if mode < 0.95:
        # raw application/ld+json body
        return {"url": url, "warc_ts": ts, "html": doc_text.encode(), "text": doc_text, "lang": lang}
    if mode < 0.975:
        # HTML without any jsonld script -> parse_failure row
        html = f"<html><head><title>no ld {i}</title></head><body>nothing here</body></html>"
        return {"url": url, "warc_ts": ts, "html": html.encode(), "text": "", "lang": lang}
    # near-empty body -> fatal-empty error row
    return {"url": url, "warc_ts": ts, "html": b"{}", "text": "", "lang": lang}


def generate_pages(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    structured_fraction: float = 0.0,
) -> DataFrame:
    """``structured_fraction`` > 0 mixes in JSON-LD-free pages annotated with
    microdata/RDFa only (exercises the multi-format fallback path)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [page_for(int(i), structured_fraction) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, parts).mapInPandas(gen, PAGES_SCHEMA)


def generate_mainstems(spark: SparkSession, n: int = 64) -> DataFrame:
    """Broadcastable spatial dictionary: grid cells over the corpus bbox so a
    deterministic subset of place centroids falls inside each polygon."""
    rows = []
    for j in range(n):
        gx, gy = j % 8, j // 8
        minx = -109.0 + gx * 0.875
        miny = 37.0 + gy * 0.5
        maxx, maxy = minx + 0.875, miny + 0.5
        wkt = (
            f"POLYGON(({minx} {miny}, {maxx} {miny}, {maxx} {maxy}, "
            f"{minx} {maxy}, {minx} {miny}))"
        )
        rows.append(
            {
                "geoconnex_url": f"https://geoconnex.us/ref/mainstems/{36800 + j}",
                "geom_wkt": wkt,
                "minx": minx,
                "miny": miny,
                "maxx": maxx,
                "maxy": maxy,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def generate_known_iris(spark: SparkSession, n: int = 500) -> DataFrame:
    """Entity-linking dictionary: canonical IRIs with surface-form variants."""
    rows = []
    for j in range(n):
        canonical = f"https://geoconnex.us/ref/entities/{j}"
        base = f"MONITORING SITE {j}"
        for variant in (base, base.lower(), base.replace(" ", "_")):
            rows.append({"iri": canonical, "surface_form": variant})
    return spark.createDataFrame(pd.DataFrame(rows))
