"""JSON-LD extraction from HTML — the byte-identical invariant surface.

Reference semantics (/root/reference/internal/crawl/helpers.go:53-100 and
site.go:32-50, studied not copied):

  * parse the HTML5 document, find the (implied) <head> element, collect all
    <script> descendants, and return the **first text child, verbatim**, of
    the first script whose ``type`` attribute *contains*
    ``application/ld+json``;
  * content-type dispatch: a body served as ``application/ld+json`` is the
    document itself; ``text/html`` goes through tag extraction; anything else
    is a non-fatal error row; a body of <= 2 bytes is fatal.

Implemented on the stdlib ``html.parser`` (CDATA mode leaves script content
byte-verbatim — no entity decoding inside <script>). The HTML5 tree-builder
behavior that matters here is emulated: metadata content (script/meta/link/
title/style/base/noscript/template) appearing before any body content belongs
to the implied <head>, even with no explicit <head> tag; the first body-level
start tag (or </head>/<body>) ends the head.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_HEAD_OK = {
    "meta", "link", "title", "style", "script", "noscript", "base", "template", "head", "html",
}


class _HeadJsonLdParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.in_head = True
        self.in_script = False
        self.script_matches = False
        self.head_seen_explicitly = False
        self.chunks: list[str] = []
        self.result: str | None = None

    def handle_starttag(self, tag, attrs):
        if self.result is not None:
            return
        if tag == "head":
            self.head_seen_explicitly = True
            self.in_head = True
            return
        if tag == "body" or (self.in_head and tag not in _HEAD_OK):
            self.in_head = False
        if tag == "script" and self.in_head:
            type_attr = next((v for k, v in attrs if k == "type"), None)
            if type_attr and "application/ld+json" in type_attr:
                self.in_script = True
                self.script_matches = True
                self.chunks = []

    def handle_endtag(self, tag):
        if self.result is not None:
            return
        if tag == "script" and self.in_script:
            self.in_script = False
            if self.script_matches:
                self.result = "".join(self.chunks)
                self.script_matches = False
        elif tag == "head":
            self.in_head = False

    def handle_data(self, data):
        if self.in_script and self.result is None:
            self.chunks.append(data)


class NoJsonLdError(ValueError):
    pass


_LDJSON_MARK = "application/ld+json"

# ---------------------------------------------------------------------------
# Fast scanner: a strict-subset HTML walk that is behavior-identical to
# _HeadJsonLdParser on the grammar it accepts, and BAILS to the full parser on
# anything outside that subset (comments, marked sections, entity refs in
# attribute values, tolerant-only tag shapes, unterminated CDATA, ...).
#
# Equivalence rests on pinned stdlib html.parser semantics (py3.11):
#   * CDATA content (script/style) ends only at re(r'</\s*NAME\s*>', re.I);
#     content is NOT entity-decoded (convert_charrefs skips cdata_elem).
#   * attribute values are html.unescape()d -> the subset forbids '&' in
#     values, making unescape the identity.
#   * '<!doctype ...' skips to the next '>' (parse_html_declaration).
#   * '<x' where x is not [a-zA-Z!/?] is literal text data.
#   * a self-closing '<script ... />' fires handle_startendtag (start+end,
#     NO cdata): a matching head script of that shape yields result "".
# Data between tags never affects tag detection under convert_charrefs, so
# the scanner skips it without inspection.
# ---------------------------------------------------------------------------

_BAIL = object()

_SIMPLE_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][\w\-]*"
    r"(?:\s*=\s*(?:\"[^\"<&]*\"|'[^'<&]*'|[\w\-./+:;,]*))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"([a-zA-Z][\w\-]*)(?:\s*=\s*(\"[^\"<&]*\"|'[^'<&]*'|[\w\-./+:;,]*))?"
)
_END_TAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_CDATA_END = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
_MAX_SCAN_TAGS = 256


def _scan_fast(text: str):
    """Return the first head-level ld+json script body (str), or _BAIL when
    the document leaves the provably-equivalent subset. Never raises."""
    in_head = True
    i = 0
    n = len(text)
    for _ in range(_MAX_SCAN_TAGS):
        lt = text.find("<", i)
        if lt == -1:
            return _BAIL  # clean EOF without a match -> let the parser decide
        nxt = text[lt + 1 : lt + 2]
        if nxt == "/":
            m = _END_TAG_RE.match(text, lt)
            if m is None:
                return _BAIL  # bogus-comment territory
            if m.group(1).lower() == "head":
                in_head = False
            i = m.end()
            continue
        if nxt == "!":
            if text[lt : lt + 9].lower() == "<!doctype":
                gt = text.find(">", lt + 9)
                if gt == -1:
                    return _BAIL
                i = gt + 1
                continue
            return _BAIL  # comment / marked section
        if not nxt.isascii() or not nxt.isalpha():
            i = lt + 1  # literal '<' text data (incl. '<?': bail below)
            if nxt == "?":
                return _BAIL  # processing instruction
            continue
        m = _SIMPLE_TAG_RE.match(text, lt)
        if m is None:
            return _BAIL  # outside the subset grammar
        tag = m.group(2).lower()
        self_closing = m.group(4) == "/"
        if tag == "head":
            # a self-closing <head/> fires startendtag = start + IMMEDIATE
            # end in the parser, so the head opens and closes on the spot
            in_head = not self_closing
            i = m.end()
            continue
        if tag == "body" or (in_head and tag not in _HEAD_OK):
            in_head = False
        if tag == "script" and in_head:
            type_attr = None
            for am in _ATTR_RE.finditer(m.group(3)):
                if am.group(1).lower() == "type":
                    v = am.group(2)
                    if v is None:
                        type_attr = None
                    elif v[:1] in ("'", '"'):
                        type_attr = v[1:-1]
                    else:
                        type_attr = v
                    break
            if type_attr and _LDJSON_MARK in type_attr:
                if self_closing:
                    return ""  # startendtag: start+end with empty content
                em = _CDATA_END[tag].search(text, m.end())
                if em is None:
                    return _BAIL  # unterminated cdata -> EOF flush semantics
                return text[m.end() : em.start()]
        if tag in _CDATA_END and not self_closing:
            em = _CDATA_END[tag].search(text, m.end())
            if em is None:
                return _BAIL
            i = em.end()
            continue
        i = m.end()
    return _BAIL  # tag budget exhausted


def get_jsonld_from_html(data: bytes | str) -> str:
    """Return the first head-level application/ld+json script body, verbatim.

    Fast paths that preserve the parser's exact semantics: a document whose
    bytes never contain the marker string cannot match (cheap negative), and
    the matching script can only start at or before the FIRST marker
    occurrence — so the parser initially consumes just through the first
    ``</script>`` after it (HTMLParser feeding is incremental, so splitting
    the input is behavior-identical) and the document tail is only parsed
    when that prefix did not yield a result."""
    if isinstance(data, bytes):
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError:
            text = data.decode("latin-1")
    else:
        text = data
    mark = text.find(_LDJSON_MARK)
    if mark == -1:
        # the cheap negative keys on the PREFIX, and only when no entity
        # reference could hide the marker: ANY char of "application/ld" can be
        # entity-encoded (type="application&#47;ld&#43;json") and decodes
        # inside the parser — so a document containing '&' always takes the
        # full parse instead of being rejected here
        if "application/ld" not in text and "&" not in text:
            raise NoJsonLdError("no JSON-LD found in document")
        cut = -1
        stop = -1
    else:
        # strict-subset scanner: behavior-identical on the grammar it
        # accepts (positive results only), bails to the parser otherwise
        res = _scan_fast(text)
        if res is not _BAIL:
            return res
        cut = -1
        stop = text.find("</script", mark)
    if stop != -1:
        tag_close = text.find(">", stop)
        if tag_close != -1:
            cut = tag_close + 1
    parser = _HeadJsonLdParser()
    try:
        parser.feed(text if cut == -1 else text[:cut])
        if parser.result is None and cut != -1:
            parser.feed(text[cut:])
        parser.close()
    except Exception:
        pass  # tolerant parse; keep whatever we captured
    if parser.result is None:
        raise NoJsonLdError("no JSON-LD found in document")
    return parser.result


# content-type dispatch codes (lineage error taxonomy)
OK = ""
ERR_NO_JSONLD = "no_jsonld"
ERR_BAD_MIME = "bad_mime"
ERR_EMPTY_BODY = "empty_body"


def extract_document(body: bytes | None, content_type_hint: str | None = None) -> tuple[str, str]:
    """(doc_text, error_code). Dispatch mirrors getJSONLD (site.go:32-50):
    raw ld+json bodies pass through; HTML goes through tag extraction;
    <=2-byte bodies are fatal-empty."""
    if body is None or len(body) <= 2:
        return "", ERR_EMPTY_BODY
    head = body.lstrip()[:1]
    looks_like_json = head in (b"{", b"[")
    if content_type_hint and "application/ld+json" in content_type_hint or (
        content_type_hint is None and looks_like_json
    ):
        try:
            return body.decode("utf-8"), OK
        except UnicodeDecodeError:
            return "", ERR_BAD_MIME
    if content_type_hint and ("html" not in content_type_hint and "ld+json" not in content_type_hint):
        return "", ERR_BAD_MIME
    try:
        return get_jsonld_from_html(body), OK
    except NoJsonLdError:
        return "", ERR_NO_JSONLD
