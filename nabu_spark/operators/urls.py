"""URL canonicalization + URL-level dedup for crawl frontiers and corpora.

The reference keys everything on raw sitemap URLs (url_info/url.go:25-45);
a web-scale corpus additionally needs the standard crawl canonicalization so
`HTTP://Ex.ORG:80/p?b=2&utm_source=x&a=1#f` and `http://ex.org/p?a=1&b=2`
dedupe to one document.

Everything is pure codegen column expressions (regexp + array ops — no
Python, whole-stage codegen end to end), and every regex avoids lookarounds
and backreferences-in-pattern so the DuckDB oracle can run the exact same
steps under RE2. Steps, in order:

  1. strip the fragment;
  2. lowercase the scheme://authority prefix (path/query case is
     significant and preserved);
  3. drop explicit default ports (:80 for http, :443 for https);
  4. drop tracking parameters (utm_*, fbclid, gclid, msclkid);
  5. sort the remaining query parameters (order-insensitive identity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid)="


def canonical_url(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    # 2. only the SCHEME and HOST[:port] are case-insensitive (RFC 3986);
    #    userinfo before '@' keeps its case (credentials are significant)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://)", 1)
    authority = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    base = F.concat(F.lower(scheme), userinfo, F.lower(hostport), rest)
    base = F.regexp_replace(base, r"^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    base = F.regexp_replace(base, r"^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    path = F.regexp_replace(base, r"\?.*$", "")
    qs = F.regexp_extract(base, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    sorted_params = F.array_sort(params)
    return F.when(
        F.size(sorted_params) > 0,
        F.concat(path, F.lit("?"), F.array_join(sorted_params, "&")),
    ).otherwise(path)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canon_url", canonical_url(url_col))


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(canon_url, canonical_id, dup_count): one shuffle on the canonical
    form; canonical_id = min id per group (the deterministic survivor),
    exactly the exact-dedup shape on content hashes."""
    return (
        canonicalize_urls(df, url_col)
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def fetch_schedule(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    *,
    per_host_delay_s: int = 1,
) -> DataFrame:
    """Politeness-constrained crawl schedule: one fetch per host per tick
    (the crawl-delay discipline the reference enforces with its per-host
    worker loop, internal/crawl/sitemap.go's sequential walk — here as a
    declarative assignment the whole cluster can consume).

    Returns (url, host, tick, not_before_s): tick = position in the host's
    queue (deterministic url order), not_before_s = earliest start offset
    under ``per_host_delay_s``. One shuffle on the host key; a mega-host
    makes one long queue — which is exactly the politeness constraint, not
    a skew bug (wall-clock is inherently bounded by the slowest host)."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(url_col)
    tick = F.row_number().over(w)
    return df.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        tick.alias("tick"),
        ((tick - 1) * F.lit(per_host_delay_s)).alias("not_before_s"),
    )
