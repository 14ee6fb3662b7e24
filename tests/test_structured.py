"""Microdata / RDFa Lite extraction semantics."""

from __future__ import annotations

from nabu_spark.functions.structured import (
    extract_microdata,
    extract_rdfa,
    extract_structured_triples,
)
from nabu_spark.operators.structured_extract import page_structured_quads

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


class TestMicrodata:
    def test_item_with_itemid(self):
        html = """<div itemscope itemtype="https://schema.org/Place"
                    itemid="https://x.org/p/1">
                  <h1 itemprop="name">GAGE ONE</h1>
                  <meta itemprop="description" content="a gage">
                  <a itemprop="url" href="/p/1/page">link</a>
                  <time itemprop="dateModified" datetime="2024-01-01">Jan</time>
                  </div>"""
        t = set(extract_microdata(html, base="https://x.org/"))
        assert ("<https://x.org/p/1>", RDF_TYPE, "<https://schema.org/Place>") in t
        assert ("<https://x.org/p/1>", "<https://schema.org/name>", '"GAGE ONE"') in t
        assert ("<https://x.org/p/1>", "<https://schema.org/url>", "<https://x.org/p/1/page>") in t
        assert ("<https://x.org/p/1>", "<https://schema.org/dateModified>", '"2024-01-01"') in t

    def test_nested_item_is_bnode(self):
        html = """<div itemscope itemtype="https://schema.org/Place" itemid="https://x/1">
                  <div itemprop="geo" itemscope itemtype="https://schema.org/GeoCoordinates">
                    <meta itemprop="latitude" content="37.1"></div></div>"""
        t = extract_microdata(html)
        bnodes = {s for s, _, _ in t if s.startswith("_:")}
        assert len(bnodes) == 1
        b = bnodes.pop()
        assert ("<https://x/1>", "<https://schema.org/geo>", b) in t
        assert (b, "<https://schema.org/latitude>", '"37.1"') in t
        # nested item's properties never leak to the parent
        assert ("<https://x/1>", "<https://schema.org/latitude>", '"37.1"') not in t

    def test_absolute_itemprop(self):
        html = """<div itemscope itemid="https://x/1">
                  <meta itemprop="http://purl.org/dc/terms/title" content="T"></div>"""
        t = extract_microdata(html)
        assert ("<https://x/1>", "<http://purl.org/dc/terms/title>", '"T"') in t

    def test_multi_itemprop_names(self):
        html = """<div itemscope itemtype="https://schema.org/Place" itemid="https://x/1">
                  <meta itemprop="name alternateName" content="N"></div>"""
        t = extract_microdata(html)
        preds = {p for _, p, _ in t}
        assert "<https://schema.org/name>" in preds
        assert "<https://schema.org/alternateName>" in preds


class TestRdfa:
    def test_vocab_and_about(self):
        html = """<body vocab="https://schema.org/">
                  <div about="https://x/1" typeof="Place">
                  <span property="name">G</span></div></body>"""
        t = set(extract_rdfa(html))
        assert ("<https://x/1>", RDF_TYPE, "<https://schema.org/Place>") in t
        assert ("<https://x/1>", "<https://schema.org/name>", '"G"') in t

    def test_prefix_mapping(self):
        html = """<body vocab="https://schema.org/"
                        prefix="gsp: http://www.opengis.net/ont/geosparql#">
                  <div about="https://x/1">
                  <span property="gsp:asWKT">POINT (1 2)</span></div></body>"""
        t = set(extract_rdfa(html))
        assert ("<https://x/1>", "<http://www.opengis.net/ont/geosparql#asWKT>", '"POINT (1 2)"') in t

    def test_content_beats_text(self):
        html = """<body vocab="https://schema.org/"><div about="https://x/1">
                  <meta property="description" content="real">shown text</meta>
                  </div></body>"""
        t = set(extract_rdfa(html))
        assert ("<https://x/1>", "<https://schema.org/description>", '"real"') in t

    def test_nested_typeof_chains(self):
        html = """<body vocab="https://schema.org/">
                  <div about="https://x/1" typeof="Place">
                    <div property="geo" typeof="GeoCoordinates">
                      <meta property="latitude" content="37.2"></div>
                  </div></body>"""
        t = extract_rdfa(html)
        bnodes = {s for s, _, _ in t if s.startswith("_:")}
        assert len(bnodes) == 1
        b = bnodes.pop()
        assert ("<https://x/1>", "<https://schema.org/geo>", b) in t
        assert (b, "<https://schema.org/latitude>", '"37.2"') in t

    def test_href_object(self):
        html = """<body vocab="https://schema.org/"><div about="https://x/1">
                  <a property="url" href="https://x/1/page">p</a></div></body>"""
        t = set(extract_rdfa(html))
        assert ("<https://x/1>", "<https://schema.org/url>", "<https://x/1/page>") in t


class TestStructuredPipeline:
    def test_combined_and_skolemized(self):
        html = """<html><body vocab="https://schema.org/">
          <div itemscope itemtype="https://schema.org/Place" itemid="https://x/md">
            <div itemprop="geo" itemscope itemtype="https://schema.org/GeoCoordinates">
              <meta itemprop="latitude" content="37.1"></div></div>
          <div about="https://x/ra" typeof="Place"><span property="name">R</span></div>
          </body></html>"""
        quads, err = page_structured_quads(html.encode(), "https://h.org/p", "sm")
        assert err == ""
        # blank nodes skolemized, prov tagged
        assert all(not s.startswith("_:") and not o.startswith("_:") for s, _, o, _ in quads)
        assert all(g.startswith("<urn:iow:summoned:sm:") for _, _, _, g in quads)
        subjects = {s for s, _, _, _ in quads}
        assert "<https://x/md>" in subjects and "<https://x/ra>" in subjects

    def test_page_without_structured_data(self):
        quads, err = page_structured_quads(b"<html><body>plain</body></html>", "u", "s")
        assert quads == [] and err == "no_structured_data"

    def test_fused_fallback_to_structured(self, spark):
        from pyspark.sql import functions as F

        from nabu_spark.pipeline import pages_to_quads_fused

        md_only = (
            '<html><head><title>t</title></head><body>'
            '<div itemscope itemtype="https://schema.org/Place" itemid="https://x/md1">'
            '<meta itemprop="name" content="MD ONLY"></div></body></html>'
        )
        ld = '{"@context":"https://schema.org/","@id":"https://x/ld1","name":"LD"}'
        pages = spark.createDataFrame(
            [
                ("https://h.org/md", None, md_only.encode(), None, "en"),
                ("https://h.org/ld", None, ld.encode(), None, "en"),
                ("https://h.org/none", None, b"<html><body>nothing</body></html>", None, "en"),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        out = pages_to_quads_fused(pages, salt=False, fallback_structured=True).collect()
        subjects = {r["subj"] for r in out if r["error_code"] is None}
        assert "<https://x/md1>" in subjects  # recovered via microdata fallback
        assert "<https://x/ld1>" in subjects  # normal JSON-LD path
        errs = {r["error_code"] for r in out if r["error_code"]}
        assert "no_structured_data" in errs
        # without fallback, the microdata page is a no_jsonld failure
        out2 = pages_to_quads_fused(pages, salt=False).collect()
        errs2 = {r["error_code"] for r in out2 if r["error_code"]}
        assert "no_jsonld" in errs2

    def test_mixed_corpus_with_fallback(self, spark):
        from pyspark.sql import functions as F

        from nabu_spark.datagen import generate_pages
        from nabu_spark.pipeline import pages_to_quads_fused

        pages = generate_pages(spark, 120, structured_fraction=0.3).cache()
        no_fb = pages_to_quads_fused(pages, salt=False).cache()
        fb = pages_to_quads_fused(pages, salt=False, fallback_structured=True).cache()
        miss_no_fb = no_fb.filter(F.col("error_code") == "no_jsonld").count()
        miss_fb = fb.filter(F.col("error_code") == "no_jsonld").count()
        assert miss_no_fb > 10  # structured-only pages fail without fallback
        assert miss_fb == 0  # ...and all recover with it
        assert fb.filter(F.col("error_code").isNull()).count() > no_fb.filter(
            F.col("error_code").isNull()
        ).count()

    def test_shared_bnode_namespace(self):
        html = """<body vocab="https://schema.org/">
          <div itemscope itemtype="https://schema.org/Thing"><meta itemprop="name" content="a"></div>
          <div typeof="Thing"><span property="name">b</span></div></body>"""
        t = extract_structured_triples(html)
        bnodes = {s for s, _, _ in t if s.startswith("_:")}
        assert len(bnodes) == 2  # distinct bnodes across formats


class TestHostileInput:
    def test_deeply_nested_page_becomes_lineage_row(self):
        # one hostile page with thousands of nested tags must yield a
        # structured_parse lineage row, never a RecursionError task failure
        depth = 4000
        html = (
            '<html><body><div itemscope itemtype="https://schema.org/Thing">'
            + "<div>" * depth
            + "x"
            + "</div>" * depth
            + "</div></body></html>"
        )
        quads, err = page_structured_quads(
            html.encode(), "https://hostile.org/p", "sm"
        )
        assert quads == []
        assert err in ("structured_parse", "no_structured_data")
        # and a well-formed page still parses after the guard
        ok_html = (
            '<html><body><div itemscope itemtype="https://schema.org/Thing">'
            '<span itemprop="name">n</span></div></body></html>'
        )
        quads, err = page_structured_quads(ok_html.encode(), "https://ok.org/p", "sm")
        assert err == "" or err is None or not err
        assert quads


class TestRdfaDatatypeInlist:
    def test_datatype_types_the_literal(self):
        from nabu_spark.functions.structured import extract_rdfa

        html = (
            '<div vocab="https://schema.org/" about="https://x.org/e" '
            'typeof="Event">'
            '<span property="startDate" datatype="xsd:date">2020-01-02</span>'
            '<span property="name" datatype="">Plain</span>'
            "</div>"
        )
        t = extract_rdfa(html.encode(), base="https://x.org/")
        objs = {p: o for s, p, o in t}
        assert (
            objs["<https://schema.org/startDate>"]
            == '"2020-01-02"^^<http://www.w3.org/2001/XMLSchema#date>'
        )
        assert objs["<https://schema.org/name>"] == '"Plain"'

    def test_inlist_builds_document_order_rdf_list(self):
        from nabu_spark.functions.structured import extract_rdfa

        html = (
            '<div vocab="https://schema.org/" about="https://x.org/w" typeof="Book">'
            '<span property="author" inlist="">A. One</span>'
            '<span property="author" inlist="">B. Two</span>'
            "</div>"
        )
        t = extract_rdfa(html.encode(), base="https://x.org/")
        rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        heads = [o for s, p, o in t if p == "<https://schema.org/author>"]
        assert len(heads) == 1 and heads[0].startswith("_:")
        firsts = {s: o for s, p, o in t if p == f"<{rdf}first>"}
        rests = {s: o for s, p, o in t if p == f"<{rdf}rest>"}
        cur, seen = heads[0], []
        while cur != f"<{rdf}nil>":
            seen.append(firsts[cur])
            cur = rests[cur]
        assert seen == ['"A. One"', '"B. Two"']

    def test_inlist_list_skolemizes_through_pipeline(self):
        html = (
            '<html><body><div vocab="https://schema.org/" '
            'about="https://x.org/w" typeof="Book">'
            '<span property="author" inlist="">A. One</span>'
            '<span property="author" inlist="">B. Two</span>'
            "</div></body></html>"
        )
        quads, err = page_structured_quads(
            html.encode(), "https://x.org/w", "sm", formats=("rdfa",)
        )
        assert not err
        # no raw bnodes survive the gate; list nodes became nqhash IRIs
        assert all(not s.startswith("_:") and not o.startswith("_:")
                   for s, _, o, _ in quads)
        assert any("rdf-syntax-ns#first" in p for _, p, _, _ in quads)


class TestFastTreeEquivalence:
    """_fast_tree must build the IDENTICAL Element tree as the stdlib
    _TreeBuilder on the subset grammar it accepts, and bail (None) outside
    it — differential battery + synthetic-corpus sweep."""

    @staticmethod
    def _stdlib_tree(text):
        import nabu_spark.functions.domtree as dt

        b = dt._TreeBuilder()
        try:
            b.feed(text)
            b.close()
        except Exception:
            pass
        return b.root

    @classmethod
    def _eq(cls, a, b):
        if isinstance(a, str) or isinstance(b, str):
            return a == b
        if a.tag != b.tag or a.attrs != b.attrs or len(a.children) != len(b.children):
            return False
        return all(cls._eq(x, y) for x, y in zip(a.children, b.children))

    BATTERY = [
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">A &amp; B</span></div>',
        '<html><body><p>a < b</p><br/><img src=x.png><div>t &lt; u &#65;</div></body></html>',
        "<ul><li>one<li>two</ul>",
        "<div><span>x</div></span>",
        '<script>var a = "<div>";</script><p>after</p>',
        '<style>p{content:"</p>"}</style><p>real</p>',
        "<table><tr><td>1</td></tr></table>",
        '<div data-x="1" DATA-Y="2" dup="a" dup="b">z</div>',
        '<meta charset="utf-8"><base href="/"><div>v</div>',
        "<script>unterminated",  # stdlib DISCARDS unterminated cdata content
        "<script>half</scr",
        "leading text<div>x</div>trailing",
        "<div>&amp</div>",
        "<div>&notanentity;</div>",
        '<DIV CLASS="Upper">m</DIV>',
    ]

    def test_adversarial_battery(self):
        import nabu_spark.functions.domtree as dt

        for t in self.BATTERY:
            f = dt._fast_tree(t)
            if f is not None:
                assert self._eq(f, self._stdlib_tree(t)), t

    def test_synthetic_corpus_sweep(self):
        import nabu_spark.functions.domtree as dt
        from nabu_spark.datagen import page_for

        bailed = 0
        for i in range(3000):
            t = page_for(i, structured_fraction=0.5)["html"].decode("utf-8", "replace")
            f = dt._fast_tree(t)
            if f is None:
                bailed += 1
                continue
            assert self._eq(f, self._stdlib_tree(t)), i
        # the fast path must actually cover the corpus, not bail everywhere
        assert bailed < 300
