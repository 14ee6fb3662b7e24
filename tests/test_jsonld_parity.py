"""Golden-value parity of the pure-Python JSON-LD -> RDF core against the
reference's own fixtures (read-only from /root/reference; behavior studied
from internal/common/{jsonld,urn}_test.go and the golden release file)."""

from __future__ import annotations

import hashlib
import json

from nabu_spark.functions.jsonld import (
    JsonLdError,
    jsonld_to_triples,
    standardize_jsonld_context,
)
from nabu_spark.functions.ntriples import (
    canonical_double,
    canonical_number,
    term_is_valid,
)
from nabu_spark.functions.skolem import skolemize_nt, skolemize_terms
from nabu_spark.functions.urn import make_urn, object_key

from .conftest import needs_reference, reference_path


def _load(path):
    with open(path) as f:
        return json.load(f)


class TestCanonicalLiterals:
    def test_golden_doubles(self):
        # urn_test.go:117-118 golden scientific-notation forms
        assert canonical_double(-109.1283306) == "-1.091283306E2"
        assert canonical_double(37.12195) == "3.712195E1"
        assert canonical_double(-107.630658496) == "-1.07630658496E2"
        assert canonical_double(57.1368) == "5.71368E1"

    def test_edge_doubles(self):
        assert canonical_double(0.0) == "0.0E0"
        assert canonical_double(1e21) == "1.0E21"
        assert canonical_double(-0.5) == "-5.0E-1"

    def test_integer_vs_double(self):
        assert canonical_number(42) == ("42", "http://www.w3.org/2001/XMLSchema#integer")
        assert canonical_number(42.0) == ("42", "http://www.w3.org/2001/XMLSchema#integer")
        assert canonical_number(42.5)[1].endswith("double")


class TestSkolemization:
    def test_empty(self):
        assert skolemize_nt("") == ""

    def test_no_blank_nodes_is_identity(self):
        nq = "<https://urn.io/xid/genid/1> <https://urn.io/xid/genid/2> <https://urn.io/xid/genid/3> ."
        assert skolemize_nt(nq) == nq

    def test_golden_single_replacement(self):
        # urn_test.go:58-75 golden: sha256(pred+obj-token) of the one line
        nq = "_: <https://urn.io/xid/genid/2> <https://urn.io/xid/genid/3> ."
        out = skolemize_nt(nq)
        assert "_:" not in out
        parts = out.split(" ")
        digest = hashlib.sha256((parts[1] + parts[2]).encode()).hexdigest()
        assert digest == "0adc62bdb95a47b9d52d8dff5e78957b1da6448e7d43fad18a4d8f9b1ccc032c"
        assert digest in out

    def test_literal_truncation_in_preimage(self):
        # the reference splits on spaces, so a literal with spaces contributes
        # only its first token to the hash preimage — must match exactly
        triples = [
            ("_:b0", "<http://p>", '"a b c"'),
        ]
        out = skolemize_terms(triples)
        expected = hashlib.sha256(b'<http://p>"a').hexdigest()
        assert out[0][0] == f"<https://docs.geoconnex.us/nqhash/{expected}>"


@needs_reference
class TestReferenceFixtureParity:
    def test_gage_jsonld_e2e(self):
        # mirror of TestE2ESkolemizeJsonld (urn_test.go:79-131)
        doc = _load(reference_path("internal/common/testdata/gage_jsonld.jsonld"))
        triples = skolemize_terms(jsonld_to_triples(doc))
        lines = [f"{s} {p} {o} ." for s, p, o in triples]
        lon = next(l for l in lines if "schema.org/longitude" in l)
        lat = next(l for l in lines if "schema.org/latitude" in l)
        wkt = next(l for l in lines if "POINT" in l)
        assert "_:" not in lon and "_:" not in lat and "_:" not in wkt
        assert "-1.091283306E2" in lon
        assert "3.712195E1" in lat
        assert "POINT (-109.1283306 37.12195)" in wkt

    def test_golden_release_file_exact(self):
        """The reference's own end-to-end golden output
        (cmd/nabu/testdata/iow_wqp_stations__5_release.nq) reproduces
        byte-for-byte as a line multiset — P/R = 1.0 on this corpus."""
        urls = {
            "1084.jsonld": "https://geoconnex.us/iow/wqp/BPMWQX-1084-WR-CC01C",
            "1085.jsonld": "https://geoconnex.us/iow/wqp/BPMWQX-1085-WR-CC01C2",
        }
        mine = set()
        for name, url in urls.items():
            doc = standardize_jsonld_context(
                _load(reference_path("cmd/nabu/testdata", name))
            )
            triples = skolemize_terms(jsonld_to_triples(doc))
            prov = "<" + make_urn(object_key("iow_wqp_stations__5", url)) + ">"
            for s, p, o in triples:
                mine.add(f"{s} {p} {o} {prov} .")
        with open(reference_path("cmd/nabu/testdata/iow_wqp_stations__5_release.nq")) as f:
            golden = {l for l in f.read().split("\n") if l.strip()}
        assert mine == golden

    def test_space_in_type_dropped_by_strict_gate(self):
        # jsonld_test.go:59-76: toRdf keeps the malformed-IRI line; the strict
        # NT->NQ conversion drops it
        doc = _load(
            reference_path("internal/common/testdata/jsonld_with_space_in_type.jsonld")
        )
        triples = jsonld_to_triples(doc)
        assert any("Extensometer well" in o for _, _, o in triples)
        kept = [
            t
            for t in triples
            if term_is_valid(t[0], as_subject=True)
            and term_is_valid(t[1], as_predicate=True)
            and term_is_valid(t[2])
        ]
        assert not any("Extensometer well" in f"{s}{p}{o}" for s, p, o in kept)
        assert len(kept) == len(triples) - 1

    def test_context_standardization_fixtures(self):
        # jsonld_standardize_test.go corpus: *_incorrect -> *_standardized
        import glob
        import os

        d = reference_path("internal/common/testdata/standardize_jsonld")
        pairs = 0
        for bad in glob.glob(os.path.join(d, "*_incorrect*.jsonld")):
            good = bad.replace("_incorrect", "_standardized")
            if not os.path.exists(good):
                continue
            got = standardize_jsonld_context(_load(bad))
            assert got["@context"] == _load(good)["@context"]
            pairs += 1
        assert pairs > 0


class TestStandardize:
    def test_string_context(self):
        doc = {"@context": "http://schema.org", "a": 1}
        assert standardize_jsonld_context(doc)["@context"] == "https://schema.org/"

    def test_no_context_errors(self):
        import pytest

        with pytest.raises(JsonLdError):
            standardize_jsonld_context({"a": 1})

    def test_map_and_array_contexts(self):
        doc = {
            "@context": [
                "http://schema.org/",
                {"hyf": "https://www.opengis.net/def/appschema/hy_features/hyf"},
            ]
        }
        out = standardize_jsonld_context(doc)["@context"]
        assert out[0] == "https://schema.org/"
        assert out[1]["hyf"] == "https://www.opengis.net/def/schema/hy_features/hyf/"


class TestSchemaOrgContextCoercions:
    """The registered https://schema.org context must apply the real served
    context's term coercions (derived from the public vocabulary dump the
    reference preloads, jsonld.go:21-54): URL-ranged properties coerce values
    to IRIs, Date/DateTime-ranged properties type their literals."""

    DOC = {
        "@context": "https://schema.org",
        "@id": "https://example.org/thing/1",
        "@type": "Dataset",
        "name": "a name",
        "url": "https://example.org/page",
        "sameAs": "https://wikidata.org/Q1",
        "startDate": "2020-01-02",
        "contentSize": "12kb",
    }

    def test_url_and_sameas_become_iris(self):
        t = jsonld_to_triples(self.DOC)
        objs = {p: o for _, p, o in t}
        assert objs["<https://schema.org/url>"] == "<https://example.org/page>"
        assert objs["<https://schema.org/sameAs>"] == "<https://wikidata.org/Q1>"
        # Text-ranged properties stay plain literals
        assert objs["<https://schema.org/name>"] == '"a name"'
        assert objs["<https://schema.org/contentSize>"] == '"12kb"'
        # Date-ranged properties get the schema:Date datatype (served context)
        assert (
            objs["<https://schema.org/startDate>"]
            == '"2020-01-02"^^<https://schema.org/Date>'
        )
        # unprefixed terms still expand through @vocab
        assert (
            "<https://schema.org/Dataset>"
            in {o for _, p, o in t if "rdf-syntax-ns#type" in p}
        )

    def test_trailing_slash_and_jsonldcontext_variants(self):
        for ctx in (
            "https://schema.org/",
            "https://schema.org/docs/jsonldcontext.jsonld",
        ):
            doc = dict(self.DOC, **{"@context": ctx})
            t = jsonld_to_triples(doc)
            objs = {p: o for _, p, o in t}
            assert objs["<https://schema.org/url>"] == "<https://example.org/page>"

    def test_register_context_file_vocab_dump(self, tmp_path):
        # PrefixToFileCache analogue: preloading a full document uses its
        # @context member (reproduces the reference's vocab-dump preload)
        import json as _json

        from nabu_spark.functions.jsonld import register_context, register_context_file

        p = tmp_path / "ctx.jsonld"
        p.write_text(_json.dumps({"@context": {"ex": "https://ex.org/ns#"},
                                  "@graph": []}))
        register_context_file("https://ctx.example.org/v1", str(p))
        doc = {
            "@context": "https://ctx.example.org/v1",
            "@id": "https://example.org/x",
            "ex:p": "v",
        }
        t = jsonld_to_triples(doc)
        assert t == [("<https://example.org/x>", "<https://ex.org/ns#p>", '"v"')]
        # restore isolation for other tests
        register_context("https://ctx.example.org/v1", None)

class TestJsonLd11Containers:
    """Fixtures modeled on the W3C json-ld-api toRdf suite shapes
    (tc028/e112-style language maps, in06-in09 @included, tc017 index maps)."""

    def test_language_map(self):
        doc = {
            "@context": {
                "label": {"@id": "http://ex.org/label", "@container": "@language"}
            },
            "@id": "http://ex.org/n1",
            "label": {
                "en": "hello",
                "DE": ["hallo", "guten tag"],
                "@none": "plain",
            },
        }
        t = sorted(jsonld_to_triples(doc))
        objs = [o for _, _, o in t]
        assert '"hallo"@de' in objs and '"guten tag"@de' in objs  # lowercased
        assert '"hello"@en' in objs
        assert '"plain"' in objs  # @none -> untagged
        assert len(t) == 4

    def test_language_map_with_set_container(self):
        doc = {
            "@context": {
                "label": {
                    "@id": "http://ex.org/label",
                    "@container": ["@language", "@set"],
                }
            },
            "@id": "http://ex.org/n1",
            "label": {"fr": "bonjour"},
        }
        t = jsonld_to_triples(doc)
        assert t == [("<http://ex.org/n1>", "<http://ex.org/label>", '"bonjour"@fr')]

    def test_included_nodes_share_graph_without_edge(self):
        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/a",
            "name": "A",
            "@included": [
                {"@id": "http://ex.org/b", "name": "B"},
                {"@id": "http://ex.org/c", "name": "C"},
            ],
        }
        t = sorted(jsonld_to_triples(doc))
        assert ("<http://ex.org/a>", "<http://ex.org/name>", '"A"') in t
        assert ("<http://ex.org/b>", "<http://ex.org/name>", '"B"') in t
        assert ("<http://ex.org/c>", "<http://ex.org/name>", '"C"') in t
        # no edge between the containing node and included nodes
        assert len(t) == 3

    def test_included_single_object_and_alias(self):
        doc = {
            "@context": {"@vocab": "http://ex.org/", "also": "@included"},
            "@id": "http://ex.org/a",
            "also": {"@id": "http://ex.org/b", "name": "B"},
        }
        t = jsonld_to_triples(doc)
        assert t == [("<http://ex.org/b>", "<http://ex.org/name>", '"B"')]

    def test_index_map_keys_dropped(self):
        doc = {
            "@context": {
                "athletes": {
                    "@id": "http://ex.org/athletes",
                    "@container": "@index",
                }
            },
            "@id": "http://ex.org/team",
            "athletes": {
                "catcher": {"@id": "http://ex.org/p1"},
                "pitcher": "free text",
            },
        }
        t = sorted(jsonld_to_triples(doc))
        assert ("<http://ex.org/team>", "<http://ex.org/athletes>",
                "<http://ex.org/p1>") in t
        assert ("<http://ex.org/team>", "<http://ex.org/athletes>",
                '"free text"') in t
        assert len(t) == 2

    def test_index_map_preserves_type_coercion(self):
        doc = {
            "@context": {
                "links": {
                    "@id": "http://ex.org/links",
                    "@container": "@index",
                    "@type": "@id",
                }
            },
            "@id": "http://ex.org/n",
            "links": {"x": "http://ex.org/t1"},
        }
        t = jsonld_to_triples(doc)
        assert t == [("<http://ex.org/n>", "<http://ex.org/links>",
                      "<http://ex.org/t1>")]


class TestJsonLdNest:
    """@nest fixtures modeled on the W3C json-ld-api toRdf suite n001-n008
    shapes: nested maps' entries are properties of the enclosing node."""

    def test_nest_properties_attach_to_enclosing_node(self):
        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/n1",
            "name": "outer",
            "@nest": {"label": "nested", "count": 3},
        }
        t = sorted(jsonld_to_triples(doc))
        assert t == sorted([
            ("<http://ex.org/n1>", "<http://ex.org/name>", '"outer"'),
            ("<http://ex.org/n1>", "<http://ex.org/label>", '"nested"'),
            ("<http://ex.org/n1>", "<http://ex.org/count>",
             '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ])

    def test_nest_alias_and_array(self):
        doc = {
            "@context": {"@vocab": "http://ex.org/", "meta": "@nest"},
            "@id": "http://ex.org/n2",
            "meta": [{"a": "1"}, {"b": "2"}],
        }
        t = sorted(jsonld_to_triples(doc))
        preds = [p for _, p, _ in t]
        assert "<http://ex.org/a>" in preds and "<http://ex.org/b>" in preds
        assert all(s == "<http://ex.org/n2>" for s, _, _ in t)

    def test_nested_nest_and_type(self):
        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/n3",
            "@nest": {"@type": "Widget", "@nest": {"deep": "yes"}},
        }
        t = sorted(jsonld_to_triples(doc))
        assert ("<http://ex.org/n3>",
                "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
                "<http://ex.org/Widget>") in t
        assert ("<http://ex.org/n3>", "<http://ex.org/deep>", '"yes"') in t

    def test_nest_value_object_is_invalid(self):
        import pytest as _pytest

        from nabu_spark.functions.jsonld import JsonLdError

        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/n4",
            "@nest": {"@value": "nope"},
        }
        with _pytest.raises(JsonLdError):
            jsonld_to_triples(doc)

    def test_nest_non_map_is_invalid(self):
        import pytest as _pytest

        from nabu_spark.functions.jsonld import JsonLdError

        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/n5",
            "@nest": "just a string",
        }
        with _pytest.raises(JsonLdError):
            jsonld_to_triples(doc)

    def test_nest_with_node_object_value(self):
        # a nested entry whose value is a node object -> edge from enclosing
        doc = {
            "@context": {"@vocab": "http://ex.org/"},
            "@id": "http://ex.org/n6",
            "@nest": {"child": {"@id": "http://ex.org/c1", "name": "kid"}},
        }
        t = sorted(jsonld_to_triples(doc))
        assert ("<http://ex.org/n6>", "<http://ex.org/child>", "<http://ex.org/c1>") in t
        assert ("<http://ex.org/c1>", "<http://ex.org/name>", '"kid"') in t


class TestBaseDirection:
    """@direction / rdfDirection="i18n-datatype" — shapes modeled on the
    W3C JSON-LD 1.1 toRdf di-* suite; serialized forms match pyld and
    json-gold (wrapped at internal/common/jsonld.go:73-87) under the
    rdfDirection option."""

    I18N = "https://www.w3.org/ns/i18n#"

    def test_context_default_direction_with_language(self):
        doc = {
            "@context": {"@language": "ar", "@direction": "rtl",
                         "title": "http://ex.org/title"},
            "@id": "http://ex.org/d",
            "title": "عنوان",
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t == [("<http://ex.org/d>", "<http://ex.org/title>",
                      f'"عنوان"^^<{self.I18N}ar_rtl>')]

    def test_default_mode_ignores_direction(self):
        # rdfDirection unset (spec default): direction dropped, language kept
        doc = {
            "@context": {"@language": "ar", "@direction": "rtl",
                         "title": "http://ex.org/title"},
            "@id": "http://ex.org/d",
            "title": "عنوان",
        }
        t = jsonld_to_triples(doc)
        assert t == [("<http://ex.org/d>", "<http://ex.org/title>",
                      '"عنوان"@ar')]

    def test_direction_without_language(self):
        doc = {
            "@id": "http://ex.org/d",
            "http://ex.org/t": {"@value": "x", "@direction": "ltr"},
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t == [("<http://ex.org/d>", "<http://ex.org/t>",
                      f'"x"^^<{self.I18N}_ltr>')]

    def test_value_object_direction_overrides_defaults(self):
        doc = {
            "@context": {"@direction": "ltr"},
            "@id": "http://ex.org/d",
            "http://ex.org/t": {"@value": "x", "@language": "he",
                                "@direction": "rtl"},
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t == [("<http://ex.org/d>", "<http://ex.org/t>",
                      f'"x"^^<{self.I18N}he_rtl>')]

    def test_term_scoped_direction_and_null_cancel(self):
        doc = {
            "@context": {
                "@direction": "rtl",
                "a": {"@id": "http://ex.org/a", "@direction": "ltr"},
                "b": {"@id": "http://ex.org/b", "@direction": None},
            },
            "@id": "http://ex.org/d",
            "a": "one",
            "b": "two",
        }
        t = sorted(jsonld_to_triples(doc, rdf_direction="i18n-datatype"))
        assert t[0][2] == f'"one"^^<{self.I18N}_ltr>'
        assert t[1][2] == '"two"'  # explicit null cancels the context default

    def test_language_tag_lowercased_in_i18n_iri(self):
        doc = {
            "@id": "http://ex.org/d",
            "http://ex.org/t": {"@value": "x", "@language": "EN-US",
                                "@direction": "ltr"},
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t[0][2] == f'"x"^^<{self.I18N}en-us_ltr>'

    def test_language_map_inherits_direction(self):
        doc = {
            "@context": {
                "@direction": "rtl",
                "label": {"@id": "http://ex.org/label",
                          "@container": "@language"},
            },
            "@id": "http://ex.org/d",
            "label": {"ar": "مرحبا"},
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t == [("<http://ex.org/d>", "<http://ex.org/label>",
                      f'"مرحبا"^^<{self.I18N}ar_rtl>')]

    def test_typed_value_unaffected_by_direction(self):
        doc = {
            "@context": {"@direction": "rtl"},
            "@id": "http://ex.org/d",
            "http://ex.org/t": {"@value": "x",
                                "@type": "http://ex.org/Type"},
        }
        t = jsonld_to_triples(doc, rdf_direction="i18n-datatype")
        assert t == [("<http://ex.org/d>", "<http://ex.org/t>",
                      '"x"^^<http://ex.org/Type>')]

    def test_invalid_direction_raises(self):
        import pytest

        with pytest.raises(JsonLdError):
            jsonld_to_triples({"@context": {"@direction": "up"},
                               "@id": "http://ex.org/d",
                               "http://ex.org/t": "x"})
