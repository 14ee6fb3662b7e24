"""pages -> quads from HTML-embedded microdata + RDFa (the JSON-LD-free web).

Same stage shape as the JSON-LD path: one mapInPandas, doc-local bnodes ->
skolemization -> strict quad gate -> URN prov; failed pages become lineage
rows. ``formats`` selects which extractors run; a page can contribute from
several (shared bnode namespace keeps cross-format references disjoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.structured import _BnodeGen, extract_microdata, extract_rdfa
from ..functions.urn import object_key
from ..operators.extract import with_host
from ..operators.triples import QUADS_SCHEMA, finish_quads

ERR_NO_STRUCTURED = "no_structured_data"


def page_structured_quads(
    body: bytes | None, url: str, sitemap_id: str, *, formats=("microdata", "rdfa")
) -> tuple[list, str]:
    if body is None or len(body) <= 2:
        return [], "empty_body"
    bnodes = _BnodeGen("sd")
    triples = []
    # row-level garbage must become lineage rows, never task failures: the
    # extract walks are recursive, so one hostile deeply-nested page would
    # otherwise RecursionError the whole task (ADVICE r01, medium)
    try:
        # one DOM parse shared by both extractors (it dominates the kernel)
        from ..functions.domtree import parse_html_tree

        tree = parse_html_tree(body)
        if "microdata" in formats:
            triples.extend(extract_microdata(body, base=url, bnodes=bnodes, tree=tree))
        if "rdfa" in formats:
            triples.extend(extract_rdfa(body, base=url, bnodes=bnodes, tree=tree))
    except Exception:
        return [], "structured_parse"
    if not triples:
        return [], ERR_NO_STRUCTURED
    quads, err, _ = finish_quads(triples, object_key(sitemap_id, url))
    return quads, err


def pages_to_structured_quads(
    pages: DataFrame, *, formats=("microdata", "rdfa")
) -> DataFrame:
    df = with_host(pages).withColumn(
        "sitemap_id", F.regexp_replace(F.col("host"), r"[^A-Za-z0-9_]", "_")
    ).select("url", "host", "sitemap_id", "html")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_s, out_p, out_o, out_g, out_h, out_e = [], [], [], [], [], []
            for url, host, sid, body in zip(
                pdf["url"], pdf["host"], pdf["sitemap_id"], pdf["html"]
            ):
                if url is None or sid is None:
                    out_s.append(None); out_p.append(None); out_o.append(None)
                    out_g.append(None); out_h.append(host); out_e.append("invalid_url")
                    continue
                if isinstance(body, memoryview):
                    body = bytes(body)
                quads, err = page_structured_quads(body, url, sid, formats=formats)
                if err:
                    out_s.append(None); out_p.append(None); out_o.append(None)
                    out_g.append(None); out_h.append(host); out_e.append(err)
                    continue
                for s, p, o, g in quads:
                    out_s.append(s); out_p.append(p); out_o.append(o)
                    out_g.append(g); out_h.append(host); out_e.append(None)
            yield pd.DataFrame(
                {
                    "subj": pd.Series(out_s, dtype="object"),
                    "pred": pd.Series(out_p, dtype="object"),
                    "obj": pd.Series(out_o, dtype="object"),
                    "prov": pd.Series(out_g, dtype="object"),
                    "host": pd.Series(out_h, dtype="object"),
                    "error_code": pd.Series(out_e, dtype="object"),
                }
            )

    return df.mapInPandas(batches, QUADS_SCHEMA)
