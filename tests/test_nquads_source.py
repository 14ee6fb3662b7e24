"""N-Quads source: pure-JVM parse, release roundtrip, SPARQL over .nq."""

from __future__ import annotations

import gzip
import os

from nabu_spark.sources.nquads import parse_nquads, read_nquads


class TestParse:
    def test_forms(self, spark):
        lines = [
            '<urn:s> <urn:p> <urn:o> .',
            '<urn:s> <urn:p> "plain lit with spaces" <urn:g> .',
            '_:b0 <urn:p> "esc \\" quote"@en .',
            '<urn:s> <urn:p> "42"^^<urn:dt> <urn:g> .',
            '',
            '# comment',
            'garbage line without terms',
            '<urn:s> <urn:p> "y" _:bg .',
            '<urn:s2> <urn:p> <urn:o2> . # trailing comment',
        ]
        df = spark.createDataFrame([(l,) for l in lines], "value string")
        rows = parse_nquads(df).collect()
        good = [r for r in rows if r.error_code is None]
        bad = [r for r in rows if r.error_code == "nq_malformed"]
        assert len(good) == 6 and len(bad) == 1
        assert bad[0].subj == "garbage line without terms"
        by_obj = {r.obj: r for r in good}
        assert '"plain lit with spaces"' in by_obj
        assert by_obj['"plain lit with spaces"'].prov == "<urn:g>"
        assert by_obj["<urn:o>"].prov is None
        assert '"esc \\" quote"@en' in by_obj
        assert by_obj['"esc \\" quote"@en'].subj == "_:b0"
        assert by_obj['"42"^^<urn:dt>'].prov == "<urn:g>"
        # spec: graph labels may be blank nodes; trailing comments are legal
        assert by_obj['"y"'].prov == "_:bg"
        assert by_obj["<urn:o2>"].prov is None

    def test_plan_is_pure_jvm(self, spark):
        df = spark.createDataFrame([("<urn:s> <urn:p> <urn:o> .",)],
                                   "value string")
        plan = parse_nquads(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_gzip_roundtrip(self, spark, tmp_path):
        p = tmp_path / "part.nq.gz"
        with gzip.open(p, "wt") as fh:
            fh.write('<urn:a> <urn:p> "one" .\n<urn:b> <urn:p> "two" .\n')
        out = read_nquads(spark, str(p)).collect()
        assert sorted(r.subj for r in out) == ["<urn:a>", "<urn:b>"]


class TestReleaseRoundtrip:
    def test_release_files_parse_and_query(self, spark, tmp_path, sf_dir):
        """write_release -> read_nquads -> SPARQL: the released artifact is
        directly queryable, no triplestore required."""
        from pyspark.sql import functions as F

        from nabu_spark.operators.release import write_release
        from nabu_spark.pipeline import pages_to_quads_fused
        from nabu_spark.sources.documents import pages_from_documents
        from nabu_spark.sparql import sparql_query

        pages = pages_from_documents(spark, sf_dir)
        quads = pages_to_quads_fused(pages.limit(40), salt=False).filter(
            F.col("error_code").isNull()
        ).select("subj", "pred", "obj", "prov").cache()
        out = str(tmp_path / "rel")
        write_release(quads, out)
        back = read_nquads(
            spark, os.path.join(out, "graphs", "*", "part-*")
        )
        assert back.filter(F.col("error_code").isNotNull()).count() == 0
        # every written quad (incl. the prov graph label) parses back
        orig = {(r.subj, r.pred, r.obj, r.prov) for r in quads.collect()}
        got = {(r.subj, r.pred, r.obj, r.prov) for r in back.collect()}
        assert got == orig
        n_types = sparql_query(
            back.filter(F.col("error_code").isNull()),
            "SELECT (COUNT(*) AS ?n) WHERE { ?s "
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t }",
        ).first().n
        assert n_types > 0
