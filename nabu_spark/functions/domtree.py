"""Lightweight DOM tree on the stdlib HTML parser.

Just enough structure for microdata/RDFa extraction: element nesting,
attributes, and text content. Void elements don't nest; misnested close tags
pop to the nearest matching open element (tolerant-parse behavior).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.parent = parent

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def text_content(self) -> str:
        out = []

        def walk(node):
            for c in node.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    def iter_elements(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter_elements()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignored (tolerant)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _fast_tree(text: str) -> Element | None:
    """Build the same tree as _TreeBuilder for documents inside the strict
    subset grammar shared with functions.html_extract._scan_fast; return None
    (bail to the stdlib parser) on comments, processing instructions,
    non-doctype declarations, entity refs in attribute values, or tolerant-
    only tag shapes. Equivalence notes (pinned stdlib html.parser, py3.11):
    data runs end exactly at each '<' and are html.unescape()d per run;
    a lone non-tag '<' is its own text chunk; script/style content is one
    verbatim chunk ending only at re(r'</\\s*NAME\\s*>', re.I); attr names
    and tag names are lowercased, attr dicts keep the LAST duplicate."""
    from html import unescape as _unescape

    from .html_extract import _ATTR_RE, _CDATA_END, _END_TAG_RE, _SIMPLE_TAG_RE

    root = Element("#document", {}, None)
    stack = [root]
    i = 0
    n = len(text)
    while i < n:
        lt = text.find("<", i)
        if lt == -1:
            rest = text[i:]
            if rest:
                stack[-1].children.append(_unescape(rest) if "&" in rest else rest)
            break
        if lt > i:
            chunk = text[i:lt]
            stack[-1].children.append(_unescape(chunk) if "&" in chunk else chunk)
        nxt = text[lt + 1 : lt + 2]
        if nxt == "/":
            m = _END_TAG_RE.match(text, lt)
            if m is None:
                return None
            tag = m.group(1).lower()
            for j in range(len(stack) - 1, 0, -1):
                if stack[j].tag == tag:
                    del stack[j:]
                    break
            i = m.end()
            continue
        if nxt == "!":
            if text[lt : lt + 9].lower() == "<!doctype":
                gt = text.find(">", lt + 9)
                if gt == -1:
                    return None
                i = gt + 1
                continue
            return None  # comment / marked section
        if not nxt.isascii() or not nxt.isalpha():
            if nxt == "?":
                return None  # processing instruction
            stack[-1].children.append("<")
            i = lt + 1
            continue
        m = _SIMPLE_TAG_RE.match(text, lt)
        if m is None:
            return None
        tag = m.group(2).lower()
        attrs: dict = {}
        for am in _ATTR_RE.finditer(m.group(3)):
            v = am.group(2)
            if v is not None and v[:1] in ("'", '"'):
                v = v[1:-1]
            attrs[am.group(1).lower()] = v
        el = Element(tag, attrs, stack[-1])
        stack[-1].children.append(el)
        self_closing = m.group(4) == "/"
        i = m.end()
        if self_closing:
            continue  # handle_startendtag: never pushed, no cdata
        if tag in _CDATA_END:
            em = _CDATA_END[tag].search(text, i)
            stack.append(el)
            if em is None:
                break  # EOF inside cdata: stdlib DISCARDS the tail (verified)
            if em.start() > i:
                el.children.append(text[i : em.start()])
            stack.pop()
            i = em.end()
            continue
        if tag not in VOID_ELEMENTS:
            stack.append(el)
    return root


def parse_html_tree(data: bytes | str) -> Element:
    if isinstance(data, bytes):
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError:
            text = data.decode("latin-1")
    else:
        text = data
    fast = _fast_tree(text)
    if fast is not None:
        return fast
    builder = _TreeBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        pass
    return builder.root
