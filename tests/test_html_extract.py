"""Byte-identical HTML JSON-LD extraction (helpers.go:53-100 semantics)."""

from __future__ import annotations

import json

import pytest

from nabu_spark.functions.html_extract import (
    ERR_BAD_MIME,
    ERR_EMPTY_BODY,
    ERR_NO_JSONLD,
    NoJsonLdError,
    extract_document,
    get_jsonld_from_html,
)

from .conftest import needs_reference, reference_path


def test_first_matching_script_verbatim():
    payload = '\n  {"@id": "x",\t "name": "a &amp; b"}\n  '
    html = (
        "<html><head>"
        '<script type="text/javascript">var x=1;</script>'
        f'<script language="" type="application/ld+json">{payload}</script>'
        '<script type="application/ld+json">{"second": true}</script>'
        "</head><body></body></html>"
    )
    # verbatim: whitespace preserved, entities NOT decoded inside <script>
    assert get_jsonld_from_html(html.encode()) == payload


def test_type_contains_match():
    html = '<head><script type="application/ld+json; charset=utf-8">{"a":1}</script></head>'
    assert get_jsonld_from_html(html) == '{"a":1}'


def test_implied_head_without_tags():
    # HTML5 puts metadata content in the implied head
    html = '<!DOCTYPE html><script type="application/ld+json">{"a":1}</script><p>hi</p>'
    assert get_jsonld_from_html(html) == '{"a":1}'


def test_body_script_ignored():
    html = (
        "<html><head><title>t</title></head><body>"
        '<script type="application/ld+json">{"a":1}</script></body></html>'
    )
    with pytest.raises(NoJsonLdError):
        get_jsonld_from_html(html)


def test_dispatch_raw_json_body():
    doc, err = extract_document(b'{"@id": "x"}')
    assert err == "" and doc == '{"@id": "x"}'


def test_dispatch_empty_body_fatal():
    assert extract_document(b"{}")[1] == ERR_EMPTY_BODY
    assert extract_document(b"")[1] == ERR_EMPTY_BODY
    assert extract_document(None)[1] == ERR_EMPTY_BODY


def test_dispatch_wrong_mime():
    assert extract_document(b"%PDF-1.4 ....", "application/pdf")[1] == ERR_BAD_MIME


def test_dispatch_html_without_jsonld():
    assert extract_document(b"<html><head></head><body>x</body></html>")[1] == ERR_NO_JSONLD


@needs_reference
class TestReferenceHtmlFixtures:
    def test_html_with_jsonld(self):
        with open(reference_path("internal/crawl/testdata/html_with_jsonld.html"), "rb") as f:
            out = get_jsonld_from_html(f.read())
        doc = json.loads(out)
        assert doc["@id"] == "https://geoconnex.us/SELFIE/usgs/huc/huc12obs/070900020601"

    def test_html_without_jsonld(self):
        with open(reference_path("internal/crawl/testdata/html_without_jsonld.html"), "rb") as f:
            data = f.read()
        with pytest.raises(NoJsonLdError):
            get_jsonld_from_html(data)

    def test_extraction_snapshot_stable(self):
        """Byte-identity snapshots: a parser change that alters even one byte
        of extracted text fails here (the per-url invariant surface)."""
        import hashlib

        snapshots = {
            "html_with_jsonld.html": (1094, "4b4e6e670944b0dd977533935180fbc1"),
            "usgs_monitoring_location_351715080252401.html": (
                718,
                "af21a39eb8697dd0895ec81e34ea453a",
            ),
        }
        for name, (length, digest) in snapshots.items():
            with open(reference_path("internal/crawl/testdata", name), "rb") as f:
                out = get_jsonld_from_html(f.read())
            assert (len(out), hashlib.md5(out.encode()).hexdigest()) == (length, digest), name

    def test_malformed_real_world_page(self):
        # messy real-world page must still extract parseable JSON-LD
        p = reference_path(
            "internal/crawl/testdata/usgs_monitoring_location_351715080252401.html"
        )
        with open(p, "rb") as f:
            out = get_jsonld_from_html(f.read())
        doc = json.loads(out)
        assert "@id" in doc or "@context" in doc


def test_entity_encoded_type_attr_still_extracts():
    # HTMLParser decodes charrefs in attribute values, so an entity-encoded
    # '+' in the type attr must still match (the fast negative keys on the
    # 'application/ld' prefix, not the full literal marker)
    from nabu_spark.functions.html_extract import get_jsonld_from_html

    html = (
        '<html><head><script type="application/ld&#43;json">{"@id":"x"}'
        "</script></head><body></body></html>"
    )
    assert get_jsonld_from_html(html.encode()) == '{"@id":"x"}'


def test_entity_encoded_slash_in_type_attr_still_extracts():
    # even the '/' can be entity-encoded, hiding the 'application/ld' prefix
    # itself: a document containing '&' must fall through to the full parse
    # instead of taking the cheap negative (ADVICE r02 #1)
    from nabu_spark.functions.html_extract import get_jsonld_from_html

    html = (
        '<html><head><script type="application&#47;ld&#43;json">{"@id":"y"}'
        "</script></head><body></body></html>"
    )
    assert get_jsonld_from_html(html.encode()) == '{"@id":"y"}'


class TestFastScannerEquivalence:
    """The strict-subset scanner (_scan_fast) must be behavior-identical to
    the full _HeadJsonLdParser wherever it returns a result — and must bail
    (not guess) outside its subset. Differential battery over the adversarial
    shapes that distinguish the two, plus a sweep of synthetic pages."""

    @staticmethod
    def _pure_parser(data):
        import nabu_spark.functions.html_extract as hx

        text = data.decode("utf-8") if isinstance(data, bytes) else data
        p = hx._HeadJsonLdParser()
        try:
            p.feed(text)
            p.close()
        except Exception:
            pass
        return p.result

    @staticmethod
    def _with_fast(data):
        import nabu_spark.functions.html_extract as hx

        try:
            return hx.get_jsonld_from_html(data)
        except hx.NoJsonLdError:
            return None

    BATTERY = [
        '<html><head><script type="application&#47;ld&#43;json">{"x":1}</script></head></html>',
        '<html><head><script type="application/ld&#43;json">{"y":2}</script></head></html>',
        '<html><head></head><body><script type="application/ld+json">{"z":3}</script></body></html>',
        '<html><div>x</div><script type="application/ld+json">{"a":1}</script></html>',
        '<html><head><style>b{content:"</style"}</style><script type="application/ld+json">{"b":1}</script></head></html>',
        '<html><head><script type="application/ld+json"/><title>t</title></head></html>',
        '<html><head><script type="application/ld+json">{"d":4}</ script ></html>',
        '<html><head><script type=application/ld+json>{"e":5}</script></html>',
        '<html><head><script type="text/plain" type="application/ld+json">{"f":6}</script></html>',
        '<HTML><HEAD><SCRIPT TYPE="application/ld+json">{"g":7}</SCRIPT></HEAD></HTML>',
        '<html><head><!-- c --><script type="application/ld+json">{"h":8}</script></head></html>',
        '<html><head><script type="application/ld+json">{"i":"</scriptx"}</script></html>',
        '<html><head><script type="application/ld+json">{"j":1}</script foo></script></html>',
        '<html><body></body><head><script type="application/ld+json">{"k":1}</script></head></html>',
        '<html><head><script type="text/javascript">var s="application/ld+json";</script>'
        '<script type="application/ld+json">{"l":1}</script></head></html>',
        '<html><head><meta content="a>b"><script type="application/ld+json">{"m":1}</script></head></html>',
        '<html><head><script type="application/ld+json">{"n":1}',
        '<html><head><title>a < b</title><script type="application/ld+json">{"o":1}</script></head></html>',
        '<html><head><my-el></my-el><script type="application/ld+json">{"p":1}</script></head></html>',
        '<html><head></head><script type="application/ld+json">{"q":1}</script></html>',
        '<html><template><div>x</div></template><script type="application/ld+json">{"r":1}</script></html>',
        # self-closing <head/> = startendtag: head opens AND closes, so the
        # script is body-level and must NOT match (review finding, r3)
        '<head/><script type="application/ld+json">{"s":1}</script>',
        '<head /><script type="application/ld+json">{"t":1}</script>',
    ]

    def test_adversarial_battery(self):
        for t in self.BATTERY:
            assert self._with_fast(t.encode()) == self._pure_parser(t), t

    def test_synthetic_corpus_sweep(self):
        from nabu_spark.datagen import page_for

        for i in range(0, 4000):
            b = page_for(i)["html"]
            assert self._with_fast(b) == self._pure_parser(b), i
