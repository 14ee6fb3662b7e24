"""Mainstem enrichment: WKT -> centroid -> spatial dictionary join -> JSON-LD
injection, performed BEFORE the toRdf stage so skolem hashes incorporate the
enrichment (ordering per the reference's release path,
/root/reference/internal/synchronizer/client_release_graphs.go:106-127; the
reference deliberately enriches at release time, not harvest time).

Spark design (SURVEY.md §2 #22-24):
  * WKT extraction is a JVM-side ``get_json_object`` — no Python;
  * centroid runs in one Arrow UDF (no GEOS in this env; pure-Python kernel);
  * the dictionary join is a broadcast **equi-join on grid cells** rather
    than a BroadcastNestedLoopJoin: polygons explode into the grid cells
    their bbox covers (driver-side, dictionary is small), doc centroids map
    to one cell, and the bbox refine happens post-join. O(docs) instead of
    O(docs x polygons), and Catalyst broadcasts the exploded dict;
  * the reference serializes every lookup behind a DuckDB mutex
    (client_release_graphs.go:115-117) — the broadcast join removes that
    bottleneck entirely;
  * injection rewrites the doc JSON in an Arrow UDF, idempotent when
    ``hyf:referencedPosition`` already exists (service.go:104-110), and docs
    without geometry or with invalid WKT pass through unlinked
    (service.go:57-84).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.wkt import centroid as wkt_centroid

HYF_PREFIX = "https://www.opengis.net/def/schema/hy_features/hyf/"

WKT_PATH = "$['gsp:hasGeometry']['gsp:asWKT']['@value']"


def with_wkt(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Pull the gsp WKT out of the raw JSON-LD text, JVM-side
    (GetWktFromJsonld semantics, jsonld.go:127-140)."""
    return docs.withColumn("wkt", F.get_json_object(F.col(doc_col), WKT_PATH))


_CENTROID_SCHEMA = T.StructType(
    [T.StructField("cx", T.DoubleType()), T.StructField("cy", T.DoubleType())]
)


@F.pandas_udf(_CENTROID_SCHEMA)
def centroid_udf(wkt: pd.Series) -> pd.DataFrame:
    xs, ys = [], []
    for w in wkt:
        if w is None:
            xs.append(None)
            ys.append(None)
            continue
        try:
            x, y = wkt_centroid(w)
            xs.append(x)
            ys.append(y)
        except ValueError:
            # invalid WKT -> doc passes through unlinked (InvalidWktError path)
            xs.append(None)
            ys.append(None)
    return pd.DataFrame({"cx": xs, "cy": ys})


def with_centroid(docs_with_wkt: DataFrame) -> DataFrame:
    c = centroid_udf(F.col("wkt"))
    return docs_with_wkt.withColumn("cx", c.getField("cx")).withColumn(
        "cy", c.getField("cy")
    )


def _grid_cells_for_bbox(minx, miny, maxx, maxy, cw, ch):
    cells = []
    ix0, ix1 = math.floor(minx / cw), math.floor(maxx / cw)
    iy0, iy1 = math.floor(miny / ch), math.floor(maxy / ch)
    for ix in range(ix0, ix1 + 1):
        for iy in range(iy0, iy1 + 1):
            cells.append(f"{ix}:{iy}")
    return cells


def mainstem_join(
    docs: DataFrame,
    mainstems: DataFrame,
    *,
    doc_col: str = "doc",
) -> DataFrame:
    """Attach ``mainstem_uri`` (nullable) to each doc row via the grid-cell
    broadcast equi-join. ``mainstems`` columns: geoconnex_url, minx, miny,
    maxx, maxy (FIXTURES.md §4)."""
    spark = docs.sparkSession
    dims = mainstems.select("geoconnex_url", "minx", "miny", "maxx", "maxy").collect()
    if not dims:
        return with_centroid(with_wkt(docs, doc_col)).withColumn(
            "mainstem_uri", F.lit(None).cast("string")
        )
    # cell size from the largest polygon bbox so each polygon covers O(1) cells
    cw = max(max(r["maxx"] - r["minx"] for r in dims), 1e-9)
    ch = max(max(r["maxy"] - r["miny"] for r in dims), 1e-9)
    # pre-group candidates per cell on the driver (dict is small): the join
    # stays 1:1 per doc — no row multiplication, therefore NO groupBy/shuffle
    # of the wide docs table afterward. Candidates are sorted by uri so the
    # in-row resolution below is deterministic (first containing bbox wins).
    cells: dict[str, list] = {}
    for r in sorted(dims, key=lambda r: r["geoconnex_url"]):
        for cell in _grid_cells_for_bbox(r["minx"], r["miny"], r["maxx"], r["maxy"], cw, ch):
            cells.setdefault(cell, []).append(
                (r["geoconnex_url"], r["minx"], r["miny"], r["maxx"], r["maxy"])
            )
    dict_df = spark.createDataFrame(
        [(cell, cands) for cell, cands in cells.items()],
        "cell string, cands array<struct<uri:string,minx:double,miny:double,maxx:double,maxy:double>>",
    )

    enriched = with_centroid(with_wkt(docs, doc_col)).withColumn(
        "cell",
        F.when(
            F.col("cx").isNotNull(),
            F.concat_ws(
                ":",
                F.floor(F.col("cx") / F.lit(cw)).cast("string"),
                F.floor(F.col("cy") / F.lit(ch)).cast("string"),
            ),
        ),
    )
    joined = enriched.join(F.broadcast(dict_df), "cell", "left")
    # point-in-bbox refine + first-match resolution, all JVM-side per row
    matched = F.filter(
        F.col("cands"),
        lambda c: (F.col("cx") >= c.getField("minx"))
        & (F.col("cx") <= c.getField("maxx"))
        & (F.col("cy") >= c.getField("miny"))
        & (F.col("cy") <= c.getField("maxy")),
    )
    return joined.withColumn(
        "mainstem_uri",
        F.when(F.size(matched) > 0, F.element_at(matched, 1).getField("uri")),
    ).drop("cands")


def add_key_to_context(doc: dict, key: str, value: str) -> dict:
    """AddKeyToJsonLDContext semantics (jsonld.go:88-124). The reference's
    string-context branch mutates then falls through to an error (an upstream
    bug); here the string context becomes {"@vocab": s, key: value} and
    succeeds, which is the evident intent."""
    if "@context" not in doc:
        raise ValueError("JSON-LD document does not have @context field")
    ctx = doc["@context"]
    if isinstance(ctx, list):
        doc["@context"] = ctx + [{key: value}]
    elif isinstance(ctx, dict):
        ctx = dict(ctx)
        ctx[key] = value
        doc["@context"] = ctx
    elif isinstance(ctx, str):
        doc["@context"] = {"@vocab": ctx, key: value}
    else:
        raise ValueError(f"JSON-LD had type {type(ctx)} for @context field")
    return doc


def inject_mainstem(doc_text: str, mainstem_uri: str) -> str:
    """AddMainstemToJsonLD semantics (service.go:104-156): idempotent insert
    of the hyf:referencedPosition subtree."""
    doc = json.loads(doc_text)
    if not isinstance(doc, dict) or "hyf:referencedPosition" in doc:
        return doc_text
    doc = add_key_to_context(doc, "hyf", HYF_PREFIX)
    doc["hyf:referencedPosition"] = [
        {
            "hyf:HY_IndirectPosition": {
                "hyf:distanceDescription": {"hyf:HY_DistanceDescription": "upstream"},
                "hyf:linearElement": {"@id": mainstem_uri},
            }
        }
    ]
    return json.dumps(doc)


def apply_injection(docs_with_mainstem: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Rewrite the doc JSON for rows with a mainstem match (Arrow UDF).
    Adds ``mainstem_injected`` (the reference's addedMainstem bool,
    service.go:56): false when the doc already carried a referencedPosition
    or had no match."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(docs_with_mainstem.schema)
        + [T.StructField("mainstem_injected", T.BooleanType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out, flags = [], []
            for doc_text, uri in zip(pdf[doc_col], pdf["mainstem_uri"]):
                if uri is None or not doc_text:
                    out.append(doc_text)
                    flags.append(False)
                    continue
                try:
                    new_text = inject_mainstem(doc_text, uri)
                    out.append(new_text)
                    flags.append(new_text != doc_text)
                except (ValueError, json.JSONDecodeError):
                    out.append(doc_text)
                    flags.append(False)
            pdf = pdf.copy()
            pdf[doc_col] = out
            pdf["mainstem_injected"] = flags
            yield pdf

    return docs_with_mainstem.mapInPandas(batches, out_schema)


def enrich_docs(docs: DataFrame, mainstems: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Full enrichment: join + injection; output schema == input schema plus
    ``mainstem_uri``."""
    joined = mainstem_join(docs, mainstems, doc_col=doc_col)
    return apply_injection(joined, doc_col=doc_col)


def enrich_docs_gated(
    docs: DataFrame,
    sitemaps: DataFrame,
    mainstems: DataFrame,
    doc_col: str = "doc",
) -> DataFrame:
    """Per-sitemap enrichment gate: only sitemaps with ``add_mainstems``
    (the AddMainstems flag, sitemap_index.go:51; enrichment happens at
    release time per docs/nabu_overview.md:22) get the spatial join +
    injection; other docs pass through with a null mainstem_uri."""
    dim = F.broadcast(
        sitemaps.select("sitemap_id", "add_mainstems").dropDuplicates(["sitemap_id"])
    )
    flagged = docs.join(dim, "sitemap_id", "left").withColumn(
        "_gate", F.coalesce(F.col("add_mainstems"), F.lit(False))
    )
    gated = flagged.filter(F.col("_gate")).drop("add_mainstems", "_gate")
    passthrough = (
        flagged.filter(~F.col("_gate"))
        .drop("add_mainstems", "_gate")
        .withColumn("mainstem_uri", F.lit(None).cast("string"))
        .withColumn("mainstem_injected", F.lit(False))
    )
    enriched = enrich_docs(gated, mainstems, doc_col=doc_col)
    # align columns (enrich adds wkt/cx/cy/cell internals? ensure identical)
    enriched = enriched.select(*passthrough.columns)
    return enriched.unionByName(passthrough)
