"""Enrichment (mainstem spatial join + JSON-LD injection) and the geo
multi-hop materialization, end to end."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nabu_spark.datagen import (
    generate_mainstems,
    generate_pages,
    make_place_doc,
)
from nabu_spark.operators.enrich import (
    add_key_to_context,
    enrich_docs,
    inject_mainstem,
    mainstem_join,
)
from nabu_spark.operators.extract import extract_docs, with_object_key
from nabu_spark.operators.geoparquet import quads_to_geo
from nabu_spark.operators.triples import docs_to_quads, doc_to_quads, quads_only


class TestContextAdd:
    def test_map_context(self):
        doc = {"@context": {"a": "https://a/"}}
        out = add_key_to_context(doc, "hyf", "https://hyf/")
        assert out["@context"]["hyf"] == "https://hyf/"

    def test_array_context(self):
        doc = {"@context": [{"a": "https://a/"}]}
        out = add_key_to_context(doc, "hyf", "https://hyf/")
        assert out["@context"][1] == {"hyf": "https://hyf/"}

    def test_string_context(self):
        doc = {"@context": "https://schema.org/"}
        out = add_key_to_context(doc, "hyf", "https://hyf/")
        assert out["@context"]["@vocab"] == "https://schema.org/"

    def test_missing_context_errors(self):
        with pytest.raises(ValueError):
            add_key_to_context({}, "hyf", "x")


class TestInjection:
    def test_inject_and_idempotent(self):
        doc = make_place_doc(3)
        text = json.dumps(doc)
        out = inject_mainstem(text, "https://geoconnex.us/ref/mainstems/99")
        parsed = json.loads(out)
        rp = parsed["hyf:referencedPosition"][0]["hyf:HY_IndirectPosition"]
        assert rp["hyf:linearElement"]["@id"] == "https://geoconnex.us/ref/mainstems/99"
        assert rp["hyf:distanceDescription"]["hyf:HY_DistanceDescription"] == "upstream"
        # idempotent: existing referencedPosition untouched
        again = inject_mainstem(out, "https://geoconnex.us/ref/mainstems/1")
        assert json.loads(again) == parsed

    def test_injection_changes_emitted_triples(self):
        doc = make_place_doc(3)
        injected = inject_mainstem(
            json.dumps(doc), "https://geoconnex.us/ref/mainstems/99"
        )
        quads, err, _ = doc_to_quads(injected, "summoned/s/k.jsonld")
        assert err == ""
        objs = {o for _, p, o, _ in quads if "linearElement" in p}
        assert "<https://geoconnex.us/ref/mainstems/99>" in objs


@pytest.fixture(scope="module")
def enriched_quads(spark):
    pages = generate_pages(spark, 120).cache()
    docs = with_object_key(extract_docs(pages, salt=False)).cache()
    mainstems = generate_mainstems(spark)
    enriched = enrich_docs(docs, mainstems)
    raw = docs_to_quads(enriched).cache()
    return docs, enriched.cache(), quads_only(raw)


class TestSpatialJoin:
    def test_place_docs_get_mainstems(self, spark, enriched_quads):
        docs, enriched, _ = enriched_quads
        matched = enriched.filter(F.col("mainstem_uri").isNotNull())
        assert matched.count() > 0
        # every match points into the dictionary id space
        bad = matched.filter(
            ~F.col("mainstem_uri").startswith("https://geoconnex.us/ref/mainstems/")
        ).count()
        assert bad == 0

    def test_known_pairing(self, spark):
        """Golden-style pairing (the HAYDITCO<->36825 analogue): a point at a
        known cell center maps to the polygon covering it."""
        doc = make_place_doc(0)
        # force a centroid at the center of grid cell row0/col0
        doc["gsp:hasGeometry"]["gsp:asWKT"]["@value"] = "POINT (-108.5625 37.25)"
        docs = spark.createDataFrame(
            [("u", "h", "s", json.dumps(doc), "", "k")],
            "url string, host string, sitemap_id string, doc string, error_code string, obj_key string",
        )
        out = mainstem_join(docs, generate_mainstems(spark)).collect()
        assert out[0]["mainstem_uri"] == "https://geoconnex.us/ref/mainstems/36800"

    def test_doc_without_geometry_passes_through(self, spark):
        docs = spark.createDataFrame(
            [("u", "h", "s", json.dumps({"@context": {}, "@id": "x"}), "", "k")],
            "url string, host string, sitemap_id string, doc string, error_code string, obj_key string",
        )
        out = enrich_docs(docs, generate_mainstems(spark)).collect()
        assert out[0]["mainstem_uri"] is None
        assert json.loads(out[0]["doc"]) == {"@context": {}, "@id": "x"}

    def test_invalid_wkt_passes_through_unlinked(self, spark):
        doc = make_place_doc(1)
        doc["gsp:hasGeometry"]["gsp:asWKT"]["@value"] = "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"
        docs = spark.createDataFrame(
            [("u", "h", "s", json.dumps(doc), "", "k")],
            "url string, host string, sitemap_id string, doc string, error_code string, obj_key string",
        )
        out = enrich_docs(docs, generate_mainstems(spark)).collect()
        assert out[0]["mainstem_uri"] is None  # degenerate centroid -> unlinked


class TestGatedEnrichment:
    def test_add_mainstems_flag_gates_enrichment(self, spark):
        import json as _json

        from nabu_spark.operators.enrich import enrich_docs_gated

        doc = make_place_doc(0)
        doc["gsp:hasGeometry"]["gsp:asWKT"]["@value"] = "POINT (-108.5625 37.25)"
        text = _json.dumps(doc)
        docs = spark.createDataFrame(
            [
                ("u1", "h1", "sm_on", text, "", "k1"),
                ("u2", "h2", "sm_off", text, "", "k2"),
                ("u3", "h3", "sm_unknown", text, "", "k3"),
            ],
            "url string, host string, sitemap_id string, doc string, error_code string, obj_key string",
        )
        sitemaps = spark.createDataFrame(
            [("sm_on", True), ("sm_off", False)], "sitemap_id string, add_mainstems boolean"
        )
        out = {r["sitemap_id"]: r for r in enrich_docs_gated(docs, sitemaps, generate_mainstems(spark)).collect()}
        assert out["sm_on"]["mainstem_uri"] == "https://geoconnex.us/ref/mainstems/36800"
        assert out["sm_on"]["mainstem_injected"] is True
        assert out["sm_off"]["mainstem_uri"] is None
        assert out["sm_unknown"]["mainstem_uri"] is None  # unknown sitemap -> off
        # gated-off docs untouched byte-for-byte
        assert out["sm_off"]["doc"] == text


class TestGeoMaterialize:
    def test_geo_roundtrip(self, spark, enriched_quads):
        docs, enriched, quads = enriched_quads
        geo = quads_to_geo(quads).cache()
        n = geo.count()
        assert n > 0
        row = geo.filter(F.col("mainstem_uri").isNotNull()).first()
        assert row is not None
        assert row["geometry"][0] == 1  # little-endian WKB
        assert row["mainstem_uri"].startswith("https://geoconnex.us/ref/mainstems/")
        assert (
            row["geoconnex_sitemap"] is not None
            and row["feature_name"] is not None
        )

    def test_multihop_matches_injection(self, spark, enriched_quads):
        """The mainstem extracted back out of the quads via the 3-hop join
        equals the mainstem injected into the doc (round-trip through RDF)."""
        docs, enriched, quads = enriched_quads
        geo = quads_to_geo(quads)
        injected_uris = {
            r["mainstem_uri"]
            for r in enriched.filter(F.col("mainstem_injected"))
            .select("mainstem_uri")
            .collect()
        }
        assert injected_uris  # some docs actually got the injection
        from_graph = {
            r["mainstem_uri"]
            for r in geo.filter(F.col("mainstem_uri").isNotNull()).collect()
        }
        # every actually-injected mainstem is recoverable from the graph;
        # docs that already carried a referencedPosition skip injection
        # (idempotency) and keep their own mainstem
        assert injected_uris <= from_graph


class TestGeoParquetFooter:
    def test_write_geoparquet_footer(self, spark, enriched_quads, tmp_path):
        """The sink writes REAL GeoParquet: every part-file carries the
        `geo` key/value footer (parquet_lib.rs:15-31 analogue) with WKB
        encoding, geometry_types, and a bbox covering the file's rows."""
        import glob
        import json as _json

        import pyarrow.parquet as pq

        from nabu_spark.functions.wkt import wkb_info
        from nabu_spark.operators.geoparquet import write_geoparquet

        docs, enriched, quads = enriched_quads
        geo = quads_to_geo(quads)
        out = str(tmp_path / "geo")
        manifest = write_geoparquet(geo, out)
        assert manifest and all(m["rows"] > 0 for m in manifest)

        files = sorted(glob.glob(out + "/part-*.parquet"))
        assert files
        total = 0
        for f in files:
            meta = pq.read_schema(f).metadata
            assert b"geo" in meta
            g = _json.loads(meta[b"geo"])
            assert g["version"] == "1.1.0"
            assert g["primary_column"] == "geometry"
            col = g["columns"]["geometry"]
            assert col["encoding"] == "WKB"
            assert col["geometry_types"]
            table = pq.read_table(f)
            total += table.num_rows
            minx, miny, maxx, maxy = col["bbox"]
            for blob in table.column("geometry").to_pylist():
                name, (bx0, by0, bx1, by1) = wkb_info(bytes(blob))
                assert name in col["geometry_types"]
                assert bx0 >= minx and by0 >= miny
                assert bx1 <= maxx and by1 <= maxy
        # reference schema column names round-trip through the footer writer
        cols = pq.read_schema(files[0]).names
        assert cols == ["geometry", "id", "geoconnex_sitemap",
                        "feature_name", "feature_description", "mainstem_uri"]
        assert total == geo.count()

    def test_all_null_partition_keeps_schema(self, spark, tmp_path):
        """A partition whose rows are all-null geometry/strings must still
        write the declared binary/string types (not inferred null()), so
        every part-file merges under one schema (ADVICE r02 #4)."""
        import glob

        import pyarrow.parquet as pq

        from nabu_spark.operators.geoparquet import GEO_SCHEMA, write_geoparquet

        import pyarrow as pa

        rows = [(None, None, None, None, None, None)]
        geo = spark.createDataFrame(rows, GEO_SCHEMA).coalesce(1)
        out = str(tmp_path / "geo_nulls")
        write_geoparquet(geo, out)
        files = sorted(glob.glob(out + "/part-*.parquet"))
        assert len(files) == 1
        schema = pq.read_schema(files[0])
        assert schema.field("geometry").type == pa.binary()
        assert schema.field("feature_name").type == pa.string()
        assert pa.types.is_null(schema.field("geometry").type) is False
        # and Spark reads it back under the declared schema
        assert spark.read.parquet(out).count() == 1
