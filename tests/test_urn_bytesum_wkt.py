from __future__ import annotations

import pytest

from nabu_spark.functions.bytesum import MASK64, bytesum, bytesum_lines
from nabu_spark.functions.urn import (
    base64_key,
    make_release_nq_name,
    make_urn,
    object_key,
)
from nabu_spark.functions.wkt import bbox, centroid, parse_wkt, wkt_to_wkb


class TestUrn:
    def test_make_urn(self):
        # urn.go:31-49 rules
        assert make_urn("summoned/x/y.jsonld") == "urn:iow:summoned:x:y.jsonld"
        assert make_urn("a/b/") == "urn:iow:a:b"
        for bad in ("", ".", "noslash", "a//b"):
            with pytest.raises(ValueError):
                make_urn(bad)

    def test_object_key_golden(self):
        # key format sitemap.go:144-149; b64 from the golden release file
        key = object_key(
            "iow_wqp_stations__5", "https://geoconnex.us/iow/wqp/BPMWQX-1084-WR-CC01C"
        )
        assert key == (
            "summoned/iow_wqp_stations__5/"
            "aHR0cHM6Ly9nZW9jb25uZXgudXMvaW93L3dxcC9CUE1XUVgtMTA4NC1XUi1DQzAxQw==.jsonld"
        )

    def test_release_naming(self):
        # helpers.go:29-52 routing
        assert make_release_nq_name("summoned/counties0") == "counties0_release.nq"
        assert make_release_nq_name("prov/counties0") == "counties0_prov.nq"
        assert make_release_nq_name("orgs/") == "organizations.nq"
        assert make_release_nq_name("orgs/acme") == "acme_organizations.nq"
        with pytest.raises(ValueError):
            make_release_nq_name("noslash")
        with pytest.raises(ValueError):
            make_release_nq_name("unknown/x")

    def test_release_naming_dotted_prefix(self):
        # getTextBeforeDot (helpers.go:19-25) uses the LAST dot and the
        # joined tail keeps trailing underscores (helpers_test.go:15-24)
        assert make_release_nq_name("summoned/a.b.c") == "a.b_release.nq"
        assert make_release_nq_name("summoned/test.go.go") == "test.go_release.nq"
        assert make_release_nq_name("summoned/a/b.x") == "a_b_release.nq"
        assert make_release_nq_name("prov/x_") == "x__prov.nq"


class TestBytesum:
    def test_simple(self):
        assert bytesum(b"abc") == ord("a") + ord("b") + ord("c")

    def test_wraparound(self):
        # hash_test.go:61 TestSumWriterWrapAround semantics: uint64 modular sum
        total = (MASK64 - 5 + 300) & MASK64
        assert (MASK64 - 5 + 300) % (1 << 64) == total

    def test_order_agnostic(self):
        a = bytesum_lines(["x y z .", "a b c ."])
        b = bytesum_lines(["a b c .", "x y z ."])
        assert a == b
        assert a == bytesum(b"x y z .\na b c .\n")


class TestWkt:
    def test_point(self):
        assert centroid("POINT (-109.1283306 37.12195)") == (-109.1283306, 37.12195)

    def test_polygon_centroid_and_bbox(self):
        sq = "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"
        assert centroid(sq) == (1.0, 1.0)
        assert bbox(sq) == (0.0, 0.0, 2.0, 2.0)

    def test_invalid_wkt_raises(self):
        with pytest.raises(ValueError):
            parse_wkt("BLOB (1 2)")
        with pytest.raises(ValueError):
            parse_wkt("POLYGON((0 0, 1 1))")  # unclosed / too short

    def test_self_intersecting_polygon_parses(self):
        # client_test.go:154-166: invalid geometry must not crash the pipeline
        p = "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"
        parse_wkt(p)  # parse ok; centroid may be degenerate
        with pytest.raises(ValueError):
            centroid(p)  # zero signed area -> explicit error, caller passes through

    def test_wkb_point_roundtrip(self):
        wkb = wkt_to_wkb("POINT (1.5 -2.5)")
        import struct

        assert wkb[0] == 1
        assert struct.unpack("<I", wkb[1:5])[0] == 1
        assert struct.unpack("<dd", wkb[5:21]) == (1.5, -2.5)
