"""Bulk Turtle/TriG source (sources/turtle.py): distributed per-file
parse, error rows, gzip, file-graph tagging, and roundtrip through the
in-repo TriG serializer (the parser itself is pinned by test_trig; these
tests pin the Spark-side plumbing)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from nabu_spark.sources.turtle import read_turtle, turtle_quads


def _write(path: str, text: str) -> None:
    if path.endswith(".gz"):
        with gzip.open(path, "wt") as fh:
            fh.write(text)
    else:
        with open(path, "w") as fh:
            fh.write(text)


class TestTurtleSource:
    def _corpus(self, tmp_path) -> str:
        d = str(tmp_path / "ttl")
        os.makedirs(d)
        _write(os.path.join(d, "a.ttl"), """@prefix p: <urn:p:> .
<urn:doc:1> p:lang "en" ;
    p:n "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:doc:2> p:lang "fr", "fr-CA" .
""")
        _write(os.path.join(d, "b.ttl.gz"),
               '@prefix p: <urn:p:> .\n<urn:doc:3> p:lang "de" .\n')
        _write(os.path.join(d, "c.trig"), """@prefix p: <urn:p:> .
<urn:doc:4> p:lang "it" .
GRAPH <urn:g:x> { <urn:doc:5> p:lang "pt" . }
""")
        _write(os.path.join(d, "bad.ttl"), "not turtle at all @@@")
        return d

    def test_parse_errors_and_gzip(self, spark, tmp_path):
        d = self._corpus(tmp_path)
        df = read_turtle(spark, d)
        good = df.filter(F.col("error_code").isNull())
        assert good.count() == 7  # a.ttl 4 (incl. ',' list) + 1 gz + 2 trig
        errs = df.filter(F.col("error_code").isNotNull()).collect()
        assert len(errs) == 1
        assert errs[0]["src_file"].endswith("bad.ttl")
        assert errs[0]["error_code"].startswith("ttl_malformed")
        langs = {r["obj"] for r in good.filter(
            F.col("pred") == "<urn:p:lang>").collect()}
        assert '"fr-CA"' in langs and '"de"' in langs and '"pt"' in langs

    def test_trig_graph_blocks_keep_graph(self, spark, tmp_path):
        d = self._corpus(tmp_path)
        rows = {r["subj"]: r["prov"]
                for r in turtle_quads(spark, d).collect()}
        assert rows["<urn:doc:5>"] == "<urn:g:x>"
        assert rows["<urn:doc:4>"] is None  # default graph stays null

    def test_graph_from_file_tagging(self, spark, tmp_path):
        d = self._corpus(tmp_path)
        df = read_turtle(spark, d, graph_from_file=True).filter(
            F.col("error_code").isNull())
        rows = {r["subj"]: r["prov"] for r in df.collect()}
        assert rows["<urn:doc:1>"] == "<urn:ttl:a>"
        assert rows["<urn:doc:3>"] == "<urn:ttl:b>"  # .ttl.gz stripped
        # explicit GRAPH block wins over the file graph
        assert rows["<urn:doc:5>"] == "<urn:g:x>"

    def test_roundtrip_through_serializer(self, spark, tmp_path):
        """serialize_trig -> read_turtle returns the exact quad set."""
        from nabu_spark.functions.trig import serialize_trig

        quads = [
            ("<urn:s:1>", "<urn:p:a>", '"x, with \\"escapes\\""', None),
            ("<urn:s:1>", "<urn:p:b>", "<urn:o:1>", None),
            ("<urn:s:2>", "<urn:p:a>", '"v"@en', "<urn:g:1>"),
            ("<urn:s:3>", "<urn:p:c>",
             '"7"^^<http://www.w3.org/2001/XMLSchema#integer>', "<urn:g:1>"),
        ]
        d = str(tmp_path / "rt")
        os.makedirs(d)
        _write(os.path.join(d, "doc.trig"), serialize_trig(quads))
        got = {(r["subj"], r["pred"], r["obj"], r["prov"])
               for r in turtle_quads(spark, d).collect()}
        assert got == set(quads)

    def test_sparql_over_turtle(self, spark, tmp_path):
        """The ingested quads feed the SPARQL engine directly (the
        cli.py `query --turtle` path)."""
        from nabu_spark.sparql import sparql_query

        d = self._corpus(tmp_path)
        out = sparql_query(
            turtle_quads(spark, d),
            'SELECT ?d WHERE { ?d <urn:p:lang> "de" }').collect()
        assert [r["d"] for r in out] == ["<urn:doc:3>"]
