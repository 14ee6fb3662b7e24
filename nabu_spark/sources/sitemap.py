"""Sitemap-index / urlset XML sources -> broadcastable dimension DataFrames.

Reference semantics (studied, not copied):
  * sitemap index: ``<sitemapindex><sitemap><loc>...`` plus geoconnex
    extension fields (sitemap_id, dataset description, add_mainstems, ...)
    — /root/reference/internal/crawl/sitemap_index.go:27-109; empty index or
    missing per-entry id is an error;
  * urlset: ``<urlset><url><loc>...`` with whitespace-trimmed loc and the
    base64 storage key — /root/reference/internal/crawl/url_info/url.go:14-45.

Sitemaps are tiny (thousands of rows) next to the page corpus, so they parse
driver-side (stdlib ElementTree, no network) and broadcast into joins.
"""

from __future__ import annotations

import base64
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _local(tag: str) -> str:
    return tag.split("}")[-1]


def parse_sitemap_index(xml_text: str) -> list[dict]:
    root = ET.fromstring(xml_text)
    if _local(root.tag) != "sitemapindex":
        raise ValueError(f"expected <sitemapindex>, got <{_local(root.tag)}>")
    entries = []
    for sm in root:
        if _local(sm.tag) != "sitemap":
            continue
        entry: dict = {
            "loc": None,
            "lastmod": None,
            "sitemap_id": None,
            "dataset_description": None,
            "documentation_link": None,
            "add_mainstems": False,
            "contact_email": None,
            "max_request_concurrency": None,
        }
        for child in sm:
            tag = _local(child.tag)
            text = (child.text or "").strip()
            if tag == "loc":
                entry["loc"] = text
            elif tag == "lastmod":
                entry["lastmod"] = text
            elif tag == "sitemap_id":
                entry["sitemap_id"] = text
            elif tag == "dataset_description":
                entry["dataset_description"] = text
            elif tag == "dataset_documentation_link":
                entry["documentation_link"] = text
            elif tag == "add_associated_mainstems":
                entry["add_mainstems"] = text.lower() == "true"
            elif tag == "contact_email":
                entry["contact_email"] = text
            elif tag == "max_request_concurrency":
                try:
                    entry["max_request_concurrency"] = int(text)
                except ValueError:
                    pass
        if entry["loc"]:
            if not entry["sitemap_id"]:
                # NewSitemapIndex errors on any <sitemap> missing the
                # geoconnex sitemap_id (sitemap_index.go:102-106) — null ids
                # would otherwise poison object keys and URNs downstream
                raise ValueError(
                    f"sitemap at index {len(entries)} with loc {entry['loc']} "
                    "is missing a geoconnex:sitemap_id field"
                )
            entries.append(entry)
    if not entries:
        raise ValueError("sitemap index contains no sitemaps")
    return entries


def parse_urlset(xml_text: str) -> list[dict]:
    root = ET.fromstring(xml_text)
    if _local(root.tag) != "urlset":
        raise ValueError(f"expected <urlset>, got <{_local(root.tag)}>")
    urls = []
    for u in root:
        if _local(u.tag) != "url":
            continue
        rec = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
        for child in u:
            tag = _local(child.tag)
            text = (child.text or "").strip()
            if tag == "loc":
                rec["loc"] = text
            elif tag == "lastmod":
                rec["lastmod"] = text
            elif tag == "changefreq":
                rec["changefreq"] = text
            elif tag == "priority":
                try:
                    rec["priority"] = float(text)
                except ValueError:
                    rec["priority"] = None
        if rec["loc"]:
            rec["base64_loc"] = base64.b64encode(rec["loc"].encode()).decode()
            urls.append(rec)
    return urls


def sitemap_index_df(spark: SparkSession, xml_text: str) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(parse_sitemap_index(xml_text)).astype(
            {"add_mainstems": "bool"}
        )
    )


def urlset_df(spark: SparkSession, xml_text: str) -> DataFrame:
    return spark.createDataFrame(pd.DataFrame(parse_urlset(xml_text)))
