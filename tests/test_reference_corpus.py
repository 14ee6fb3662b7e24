"""Corpus-wide conversion coverage over the reference's own fixture files
(mirrors jsonld_test.go:174-222 and the shacl corpus tests)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from nabu_spark.functions.jsonld import (
    get_wkt_from_jsonld,
    jsonld_to_triples,
    standardize_jsonld_context,
)
from nabu_spark.functions.skolem import skolemize_terms
from nabu_spark.operators.triples import doc_to_quads

from .conftest import needs_reference, reference_path


def _docs(*patterns):
    out = []
    for pat in patterns:
        out.extend(sorted(glob.glob(reference_path(pat))))
    return out


@needs_reference
class TestCorpusConversion:
    def test_every_fixture_converts(self):
        """Every JSON-LD fixture in the reference converts without error and
        skolemizes to a blank-node-free graph."""
        files = _docs(
            "internal/crawl/testdata/*.jsonld",
            "internal/common/testdata/conformant_jsonld/*.jsonld",
            "shacl_validator/testdata/valid/*.jsonld",
            "internal/synchronizer/testdata/pids/*.jsonld",
        )
        assert len(files) > 20
        converted = 0
        for f in files:
            with open(f) as fh:
                doc = json.load(fh)
            if isinstance(doc, dict) and "@context" in doc:
                doc = standardize_jsonld_context(doc)
            triples = skolemize_terms(jsonld_to_triples(doc))
            for s, p, o in triples:
                assert not s.startswith("_:") and not o.startswith("_:"), f
            converted += 1
        assert converted == len(files)

    def test_empty_as_triples_yields_empty_graph(self):
        # the fixture's name is its golden behavior
        with open(reference_path("internal/crawl/testdata/emptyAsTriples.jsonld")) as f:
            doc = json.load(f)
        assert jsonld_to_triples(doc) == []

    def test_empty_graph_is_error_row_in_pipeline(self):
        with open(reference_path("internal/crawl/testdata/emptyAsTriples.jsonld")) as f:
            text = f.read()
        quads, err, _ = doc_to_quads(text, "summoned/s/k.jsonld")
        assert quads == [] and err == "empty_graph"

    def test_wkt_extraction_coverage(self):
        """jsonld_test.go:174-222: every conformant doc yields a geometry via
        the exact gsp:hasGeometry/gsp:asWKT/@value path."""
        files = _docs("internal/common/testdata/conformant_jsonld/*.jsonld")
        assert files
        for f in files:
            with open(f) as fh:
                doc = json.load(fh)
            wkt = get_wkt_from_jsonld(doc)
            assert wkt, f"no geometry found in {os.path.basename(f)}"

    def test_pids_corpus_quads(self):
        """The 31 gage docs of the synchronizer suite all produce quads with
        valid terms through the full doc_to_quads gate."""
        files = _docs("internal/synchronizer/testdata/pids/*.jsonld")
        assert len(files) >= 30
        for f in files:
            with open(f) as fh:
                text = fh.read()
            quads, err, dropped = doc_to_quads(text, "summoned/iow/x.jsonld")
            assert err == "" and quads, os.path.basename(f)
