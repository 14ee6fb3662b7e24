"""Main-content text extraction from HTML (jusText/trafilatura-lite).

North-star surface beyond the reference (which only extracts JSON-LD script
tags): turn a crawled page into training text by keeping content blocks and
dropping chrome. Classifier per block (the jusText core idea, simplified to
a deterministic rule set):

  * blocks = text of p / h1-h6 / li / td / pre / blockquote elements,
    whitespace-normalized (script/style/noscript/template/svg/nav subtrees
    are skipped entirely);
  * a block is BOILERPLATE when it is short (< ``min_block_chars``) or
    link-dense (chars inside <a> descendants / total chars >
    ``max_link_density``) — navigation, footers, tag clouds;
  * kept blocks join with a blank line, document order.

Built on the same from-scratch ``functions/domtree`` the microdata/RDFa
extractors use — one parse per page, no external parser.

Scale shape: one narrow Arrow pass over (url, html); no shuffle, no state;
lineage columns count kept/dropped blocks per page.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .domtree import parse_html_tree

_WS_RE = re.compile(r"\s+")

_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "nav"}
_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "pre",
               "blockquote"}


def _block_stats(el) -> tuple[str, int]:
    """(normalized text, chars inside <a> descendants) for one block,
    skipping _SKIP_TAGS subtrees."""
    parts: list[str] = []
    link_chars = 0

    def walk(node, in_link: bool):
        nonlocal link_chars
        for child in node.children:
            if isinstance(child, str):
                parts.append(child)
                if in_link:
                    link_chars += len(_WS_RE.sub(" ", child).strip())
                continue
            if child.tag in _SKIP_TAGS:
                continue
            walk(child, in_link or child.tag == "a")

    walk(el, False)
    text = _WS_RE.sub(" ", "".join(parts)).strip()
    return text, link_chars


def extract_main_text(
    html, *, min_block_chars: int = 25, max_link_density: float = 0.5
) -> tuple[str, int, int]:
    """(main_text, blocks_kept, blocks_dropped) for one page. Nested block
    tags (li inside td, p inside blockquote) contribute once: only the
    OUTERMOST block element in a lineage is classified."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    root = parse_html_tree(html)
    kept: list[str] = []
    dropped = 0

    def walk(el, inside_block: bool):
        nonlocal dropped
        for child in el.children:
            if isinstance(child, str):
                continue
            if child.tag in _SKIP_TAGS:
                continue
            if not inside_block and child.tag in _BLOCK_TAGS:
                text, link_chars = _block_stats(child)
                n = len(text)
                density = link_chars / n if n else 1.0
                if n >= min_block_chars and density <= max_link_density:
                    kept.append(text)
                else:
                    dropped += 1
                walk(child, True)
            else:
                walk(child, inside_block)

    walk(root, False)
    return "\n\n".join(kept), len(kept), dropped


def pages_to_text(
    pages: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
    min_block_chars: int = 25,
    max_link_density: float = 0.5,
) -> DataFrame:
    """(url, main_text, blocks_kept, blocks_dropped): the crawl->corpus
    text stage. One mapInPandas pass; parse errors surface as empty text
    with both counters zero rather than task failures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts, n_kept, n_drop = [], [], []
            for body in pdf[html_col]:
                try:
                    t, k, d = extract_main_text(
                        body,
                        min_block_chars=min_block_chars,
                        max_link_density=max_link_density,
                    )
                except Exception:
                    t, k, d = "", 0, 0
                texts.append(t)
                n_kept.append(k)
                n_drop.append(d)
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "main_text": pd.Series(texts, dtype="object"),
                    "blocks_kept": pd.Series(n_kept, dtype="int32"),
                    "blocks_dropped": pd.Series(n_drop, dtype="int32"),
                }
            )

    return pages.select(F.col(url_col), F.col(html_col)).mapInPandas(
        batches,
        "url string, main_text string, blocks_kept int, blocks_dropped int",
    )
