"""quads -> GeoParquet-shaped table: the multi-hop RDF traversal as joins.

Re-expresses /root/reference/triples_to_geoparquet/src/triples_lib.rs:27-184
(a hash-map chain walk in Rust) as DataFrame self-joins on the quads table:

    geometry:  pid -gsp:hasGeometry-> gnode -gsp:asWKT-> wkt   (2 hops)
    mainstem:  pid -hyf:referencedPosition-> rp
                  -hyf:HY_IndirectPosition-> ip
                  -hyf:linearElement-> uri  (kept when uri contains
                  'geoconnex.us/ref/mainstems/', first match per pid)
    name/description: direct schema.org predicates

Output columns match main.rs:83-91: (geometry WKB, id, sitemap, name,
description, mainstem_uri); sitemap is derived from the prov URN. Dangling
geometry refs (hasGeometry with no asWKT) surface as lineage error rows
(combine_geometry_representations errors there; here: left-join + null check).

Scale notes: all hops are equi-joins on (obj = subj) — shuffle hash/sort-merge
joins that AQE can re-plan; predicate filters cut each side before the join;
the WKB encode is one Arrow UDF at the end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.ntriples import unescape_literal
from ..functions.wkt import wkt_to_wkb

GSP_HAS_GEOMETRY = "<http://www.opengis.net/ont/geosparql#hasGeometry>"
GSP_AS_WKT = "<http://www.opengis.net/ont/geosparql#asWKT>"
SCHEMA_NAME = "<https://schema.org/name>"
SCHEMA_DESCRIPTION = "<https://schema.org/description>"
HYF_REFERENCED_POSITION = (
    "<https://www.opengis.net/def/schema/hy_features/hyf/referencedPosition>"
)
HYF_INDIRECT_POSITION = (
    "<https://www.opengis.net/def/schema/hy_features/hyf/HY_IndirectPosition>"
)
HYF_LINEAR_ELEMENT = "<https://www.opengis.net/def/schema/hy_features/hyf/linearElement>"
MAINSTEM_MARKER = "geoconnex.us/ref/mainstems/"


def _edges(quads: DataFrame, pred: str, s: str, o: str) -> DataFrame:
    return quads.filter(F.col("pred") == pred).select(
        F.col("subj").alias(s), F.col("obj").alias(o)
    )


def _literal_text(col):
    """Strip the quotes/datatype suffix of an N-Triples literal and unescape
    (main.rs strips the surrounding quotes the same way)."""
    lex = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    return lex


def mainstem_uris(quads: DataFrame) -> DataFrame:
    """pid -> mainstem_uri via the 3-hop chain; first (min) matching uri per
    pid, mirroring the Rust break-on-first with deterministic tie-break."""
    rp = _edges(quads, HYF_REFERENCED_POSITION, "pid", "rp")
    ip = _edges(quads, HYF_INDIRECT_POSITION, "rp", "ip")
    le = _edges(quads, HYF_LINEAR_ELEMENT, "ip", "uri").filter(
        F.col("uri").contains(MAINSTEM_MARKER)
    )
    return (
        rp.join(ip, "rp")
        .join(le, "ip")
        .groupBy("pid")
        .agg(F.min("uri").alias("mainstem_uri_term"))
    )


def geometries(quads: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(pid -> wkt, dangling-ref error rows). Geometry merge semantics of
    combine_geometry_representations (triples_lib.rs:157-184): geosparql WKT
    is canonical; a hasGeometry edge whose node lacks asWKT is an error."""
    has_geom = _edges(quads, GSP_HAS_GEOMETRY, "pid", "gnode")
    as_wkt = _edges(quads, GSP_AS_WKT, "gnode", "wkt_term")
    joined = has_geom.join(as_wkt, "gnode", "left")
    good = joined.filter(F.col("wkt_term").isNotNull()).select(
        "pid", _literal_text(F.col("wkt_term")).alias("wkt")
    )
    dangling = joined.filter(F.col("wkt_term").isNull()).select("pid", "gnode")
    return good, dangling


# column names match the reference writer byte-for-byte (main.rs
# generate_schema: geometry, id, geoconnex_sitemap, feature_name,
# feature_description, mainstem_uri)
GEO_SCHEMA = T.StructType(
    [
        T.StructField("geometry", T.BinaryType()),
        T.StructField("id", T.StringType()),
        T.StructField("geoconnex_sitemap", T.StringType()),
        T.StructField("feature_name", T.StringType()),
        T.StructField("feature_description", T.StringType()),
        T.StructField("mainstem_uri", T.StringType()),
    ]
)


def quads_to_geo(quads: DataFrame) -> DataFrame:
    """Full geo materialization. ``sitemap`` comes from the prov URN
    (urn:iow:summoned:{sitemap}:{key} -> segment 3)."""
    geom, _dangling = geometries(quads)
    names = _edges(quads, SCHEMA_NAME, "pid", "name_term")
    descs = _edges(quads, SCHEMA_DESCRIPTION, "pid", "desc_term")
    ms = mainstem_uris(quads)
    sitemap = quads.select(
        F.col("subj").alias("pid"),
        F.split(F.regexp_replace(F.col("prov"), r"^<|>$", ""), ":").getItem(3).alias(
            "sitemap"
        ),
    ).dropDuplicates(["pid"])

    rows = (
        geom.join(names, "pid", "left")
        .join(descs, "pid", "left")
        .join(ms, "pid", "left")
        .join(sitemap, "pid", "left")
        .select(
            "pid",
            "wkt",
            _literal_text(F.col("name_term")).alias("name"),
            _literal_text(F.col("desc_term")).alias("description"),
            F.regexp_replace(F.col("mainstem_uri_term"), r"^<|>$", "").alias(
                "mainstem_uri"
            ),
            "sitemap",
        )
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms, ids, sitemaps, names_, descs_, uris = [], [], [], [], [], []
            for pid, wkt, name, desc, uri, sm in zip(
                pdf["pid"], pdf["wkt"], pdf["name"], pdf["description"],
                pdf["mainstem_uri"], pdf["sitemap"],
            ):
                try:
                    wkb = wkt_to_wkb(unescape_literal(wkt)) if wkt else None
                except ValueError:
                    wkb = None
                if wkb is None:
                    continue  # unparseable geometry -> skipped (parse error path)
                geoms.append(wkb)
                ids.append(pid.strip("<>") if pid else None)
                sitemaps.append(sm)
                names_.append(unescape_literal(name) if name else None)
                descs_.append(unescape_literal(desc) if desc else None)
                uris.append(uri)
            yield pd.DataFrame(
                {
                    "geometry": pd.Series(geoms, dtype="object"),
                    "id": pd.Series(ids, dtype="object"),
                    "geoconnex_sitemap": pd.Series(sitemaps, dtype="object"),
                    "feature_name": pd.Series(names_, dtype="object"),
                    "feature_description": pd.Series(descs_, dtype="object"),
                    "mainstem_uri": pd.Series(uris, dtype="object"),
                }
            )

    return rows.mapInPandas(encode, GEO_SCHEMA)


def write_geoparquet(
    geo: DataFrame, out_dir: str, *, geometry_col: str = "geometry"
) -> list[dict]:
    """Write REAL GeoParquet: parquet part-files carrying the ``geo``
    key/value footer metadata (GeoParquet 1.1: version, primary_column,
    per-column encoding WKB + geometry_types + bbox), matching what the
    reference's Rust sidecar emits via GeoParquetRecordBatchEncoder
    (/root/reference/triples_to_geoparquet/src/parquet_lib.rs:15-31).

    Spark's builtin parquet sink cannot attach custom footer metadata, so
    each partition writes its own footer-complete file with pyarrow inside a
    mapInPandas pass — fully distributed, one file per non-empty partition,
    deterministic partition-id names (idempotent under task retry). Returns
    the small manifest [(file, rows, bbox)...]."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    from ..functions.wkt import wkb_info

    os.makedirs(out_dir, exist_ok=True)
    # explicit arrow schema derived from the DataFrame schema: per-partition
    # pandas inference would type an all-null column as null(), producing
    # part files with inconsistent schemas that readers refuse to merge
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(geo.schema)

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in it if len(pdf)]
        if not parts:
            yield pd.DataFrame({"file": [], "rows": [], "bbox": []})
            return
        pdf = pd.concat(parts)
        gtypes: set[str] = set()
        gbbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
        for blob in pdf[geometry_col]:
            if blob is None:
                continue
            try:
                name, (minx, miny, maxx, maxy) = wkb_info(bytes(blob))
            except ValueError:
                continue  # foreign/unparseable WKB: still written, just
                # excluded from the summary stats (never a task failure)
            gtypes.add(name)
            gbbox = [
                min(gbbox[0], minx), min(gbbox[1], miny),
                max(gbbox[2], maxx), max(gbbox[3], maxy),
            ]
        col_meta = {"encoding": "WKB", "geometry_types": sorted(gtypes)}
        import math

        if all(math.isfinite(v) for v in gbbox):
            col_meta["bbox"] = gbbox  # bbox is optional; Infinity is not JSON
        geo_meta = {
            "version": "1.1.0",
            "primary_column": geometry_col,
            "columns": {geometry_col: col_meta},
        }
        table = pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False)
        table = table.replace_schema_metadata(
            {**(table.schema.metadata or {}), b"geo": json.dumps(geo_meta).encode()}
        )
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        pq.write_table(table, path)
        yield pd.DataFrame(
            {
                "file": [path],
                "rows": [len(pdf)],
                "bbox": [json.dumps(col_meta.get("bbox"))],
            }
        )

    manifest_schema = "file string, rows long, bbox string"
    manifest = geo.mapInPandas(write_part, manifest_schema).collect()
    return [r.asDict() for r in manifest]
