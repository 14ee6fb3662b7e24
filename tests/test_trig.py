"""TriG parser/serializer (functions/trig.py) + GraphStore export."""

import re

import pytest

from nabu_spark.functions.trig import parse_trig, serialize_trig
from nabu_spark.functions.turtle import RDF_TYPE, TurtleError


def _norm(t):
    from nabu_spark.functions.ntriples import unescape_literal

    m = re.match(r'\A"(.*)"(@[A-Za-z0-9-]+|\^\^<[^<>]*>)?\Z', t, re.S)
    return t if not m else (unescape_literal(m.group(1)), m.group(2) or "")


def _canon(quads):
    return {(_norm(s), _norm(p), _norm(o), g) for s, p, o, g in quads}


class TestParser:
    def test_all_statement_forms(self):
        got = parse_trig("""
            @prefix ex: <urn:ex:> .
            ex:s ex:p ex:o .                       # default, bare
            { ex:s2 ex:p "two" . }                 # default, wrapped
            ex:g1 { ex:s3 ex:p ex:o3 . }           # named, bare label
            GRAPH ex:g2 { ex:s4 a ex:C }           # named, GRAPH kw, no dot
        """)
        assert set(got) == {
            ("<urn:ex:s>", "<urn:ex:p>", "<urn:ex:o>", None),
            ("<urn:ex:s2>", "<urn:ex:p>", '"two"', None),
            ("<urn:ex:s3>", "<urn:ex:p>", "<urn:ex:o3>", "<urn:ex:g1>"),
            ("<urn:ex:s4>", RDF_TYPE, "<urn:ex:C>", "<urn:ex:g2>"),
        }

    def test_multiple_statements_and_semicolons_in_block(self):
        got = parse_trig("""
            @prefix ex: <urn:ex:> .
            GRAPH ex:g {
              ex:a ex:p ex:b ; ex:q "x", "y" .
              ex:c ex:p ex:d
            }
        """)
        assert _canon(got) == _canon([
            ("<urn:ex:a>", "<urn:ex:p>", "<urn:ex:b>", "<urn:ex:g>"),
            ("<urn:ex:a>", "<urn:ex:q>", '"x"', "<urn:ex:g>"),
            ("<urn:ex:a>", "<urn:ex:q>", '"y"', "<urn:ex:g>"),
            ("<urn:ex:c>", "<urn:ex:p>", "<urn:ex:d>", "<urn:ex:g>"),
        ])

    def test_bnode_graph_label_and_bnode_content(self):
        got = parse_trig(
            "_:g { <urn:s> <urn:p> [ <urn:q> \"v\" ] . }")
        assert len(got) == 2
        assert all(g == "_:g" for *_, g in got)
        (s1, p1, o1, _), (s2, p2, o2, _) = sorted(got)

    def test_empty_block_and_trailing_dot(self):
        assert parse_trig("<urn:g> { }") == []
        assert parse_trig("GRAPH <urn:g> { <urn:s> <urn:p> <urn:o> . }") \
            == [("<urn:s>", "<urn:p>", "<urn:o>", "<urn:g>")]

    def test_errors(self):
        with pytest.raises(TurtleError):
            parse_trig('"lit" { <urn:s> <urn:p> <urn:o> . }')
        with pytest.raises(TurtleError):
            parse_trig("GRAPH <urn:g> { <urn:s> <urn:p> <urn:o> .")
        with pytest.raises(TurtleError):
            parse_trig("[ <urn:p> <urn:o> ] { <urn:s> <urn:p> <urn:o> . }")

    def test_plain_turtle_still_parses_and_rejects_braces(self):
        from nabu_spark.functions.turtle import parse_turtle

        assert parse_turtle("<urn:s> <urn:p> <urn:o> .") == [
            ("<urn:s>", "<urn:p>", "<urn:o>")]
        with pytest.raises(TurtleError):
            parse_turtle("<urn:g> { <urn:s> <urn:p> <urn:o> . }")


class TestSerializer:
    QUADS = [
        ("<urn:x:a>", RDF_TYPE, "<urn:x:C>", None),
        ("<urn:x:a>", "<urn:x:p>", '"v"', None),
        ("<urn:x:b>", "<urn:x:p>", '"w\\n2"@en', "<urn:x:g1>"),
        ("<urn:x:b>", "<urn:x:q>",
         '"3"^^<http://www.w3.org/2001/XMLSchema#integer>', "<urn:x:g2>"),
        ("_:b0", "<urn:x:p>", "<urn:x:a>", "<urn:x:g1>"),
    ]

    def test_layout_and_roundtrip(self):
        pfx = {"x": "urn:x:", "xsd": "http://www.w3.org/2001/XMLSchema#"}
        trig = serialize_trig(self.QUADS, pfx)
        # default graph first, then sorted GRAPH blocks, compaction applied
        assert trig.index("x:a a x:C") < trig.index("GRAPH x:g1 {")
        assert trig.index("GRAPH x:g1 {") < trig.index("GRAPH x:g2 {")
        assert '"3"^^xsd:integer' in trig
        assert _canon(parse_trig(trig)) == _canon(self.QUADS)

    def test_deterministic_under_input_order(self):
        pfx = {"x": "urn:x:"}
        assert serialize_trig(self.QUADS, pfx) == serialize_trig(
            list(reversed(self.QUADS)), pfx)

    def test_random_roundtrip(self):
        import random

        rng = random.Random(7)
        lexes = ["plain", 'q"uote', "new\nline", "tab\there", "uni\u00e9"]
        for _ in range(15):
            quads = set()
            for _ in range(rng.randint(1, 15)):
                s = rng.choice(["<urn:s:1>", "<urn:s:2>", "_:bn"])
                p = rng.choice(["<urn:p:a>", "<urn:p:b>"])
                if rng.random() < 0.4:
                    o = rng.choice(["<urn:o:x>", "_:bo"])
                else:
                    lex = rng.choice(lexes).replace("\\", "\\\\") \
                        .replace('"', '\\"').replace("\n", "\\n") \
                        .replace("\t", "\\t")
                    o = f'"{lex}"'
                    if rng.random() < 0.3:
                        o += "@de"
                g = rng.choice([None, "<urn:g:1>", "<urn:g:2>"])
                quads.add((s, p, o, g))
            trig = serialize_trig(quads)
            assert _canon(parse_trig(trig)) == _canon(quads), trig


class TestStoreExport:
    def test_to_trig_and_cli_export(self, spark, tmp_path):
        from nabu_spark.graphstore import GraphStore

        st = GraphStore(spark, str(tmp_path / "store"))
        st.init(spark.createDataFrame(
            [("<urn:s>", "<urn:p>", '"v"', None),
             ("<urn:a>", "<urn:p>", "<urn:b>", "<urn:g:1>")],
            "subj string, pred string, obj string, prov string"))
        trig = st.to_trig()
        assert _canon(parse_trig(trig)) == _canon([
            ("<urn:s>", "<urn:p>", '"v"', None),
            ("<urn:a>", "<urn:p>", "<urn:b>", "<urn:g:1>"),
        ])
        with pytest.raises(ValueError):
            st.to_trig(max_quads=1)

        from tests.test_cli import run_cli

        outp = tmp_path / "dump.trig"
        code, stdout = run_cli(["store", "export",
                                "--store", str(tmp_path / "store"),
                                "--out", str(outp)])
        assert code == 0, stdout
        assert _canon(parse_trig(outp.read_text())) == _canon(parse_trig(trig))


class TestLoadTextFormats:
    """SPARQL LOAD of .ttl / .trig files into the graph store."""

    def test_load_turtle_and_trig(self, spark, tmp_path):
        from nabu_spark.graphstore import GraphStore

        (tmp_path / "d.ttl").write_text(
            "@prefix ex: <urn:ex:> . ex:s ex:p ex:o .")
        (tmp_path / "d.trig").write_text(
            "@prefix ex: <urn:ex:> .\n"
            "ex:d ex:p \"v\" .\n"
            "GRAPH ex:g { ex:a ex:p ex:b . }")
        st = GraphStore(spark, str(tmp_path / "store"))
        st.init(spark.createDataFrame(
            [], "subj string, pred string, obj string, prov string"))
        st.load(str(tmp_path / "d.ttl"))
        st.load(str(tmp_path / "d.trig"))
        got = {tuple(r) for r in st.read().collect()}
        assert got == {
            ("<urn:ex:s>", "<urn:ex:p>", "<urn:ex:o>", None),
            ("<urn:ex:d>", "<urn:ex:p>", '"v"', None),
            ("<urn:ex:a>", "<urn:ex:p>", "<urn:ex:b>", "<urn:ex:g>"),
        }
        # INTO GRAPH overrides the document's own graphs
        st.update(f"LOAD <file://{tmp_path}/d.trig> INTO GRAPH <urn:all>")
        in_all = {tuple(r) for r in st.read().collect()
                  if r.prov == "<urn:all>"}
        assert in_all == {
            ("<urn:ex:d>", "<urn:ex:p>", '"v"', "<urn:all>"),
            ("<urn:ex:a>", "<urn:ex:p>", "<urn:ex:b>", "<urn:all>"),
        }

    def test_load_silent_on_bad_turtle(self, spark, tmp_path):
        from nabu_spark.graphstore import GraphStore
        from nabu_spark.sparql import SparqlError  # noqa: F401

        (tmp_path / "bad.ttl").write_text("this is { not turtle")
        st = GraphStore(spark, str(tmp_path / "store"))
        st.init(spark.createDataFrame(
            [("<urn:s>", "<urn:p>", "<urn:o>", None)],
            "subj string, pred string, obj string, prov string"))
        v0 = st.tbl.latest_version()
        st.update(f"LOAD SILENT <file://{tmp_path}/bad.ttl>")
        assert st.read().count() == 1
        import pytest as _pytest
        with _pytest.raises(Exception):
            st.update(f"LOAD <file://{tmp_path}/bad.ttl>")
        assert st.read().count() == 1


def test_dot_immediately_before_closing_brace():
    assert parse_trig("<urn:g> { <urn:s> <urn:p> <urn:o> .}") == [
        ("<urn:s>", "<urn:p>", "<urn:o>", "<urn:g>")]
