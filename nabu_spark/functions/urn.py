"""URN / object-key derivation.

Mirrors the reference's identity scheme (studied, not copied):
  - object key:   ``summoned/{sitemap_id}/{base64(url)}.jsonld``
    (/root/reference/internal/crawl/sitemap.go:144-149)
  - named-graph URN: ``urn:iow`` + ``:``-joined path segments; empty prefix,
    no-slash, or ``//`` are errors (/root/reference/internal/common/urn.go:31-49)
  - release file routing (/root/reference/internal/synchronizer/helpers.go:29-52)

These are also exposed as Spark column expressions in
nabu_spark.operators.release so the hot path stays JVM-side.
"""

from __future__ import annotations

import base64

BASE_URN = "urn:iow"


def base64_key(url: str) -> str:
    return base64.b64encode(url.encode("utf-8")).decode("ascii")


def object_key(sitemap_id: str, url: str) -> str:
    return f"summoned/{sitemap_id}/{base64_key(url)}.jsonld"


def make_urn(s3_prefix: str) -> str:
    if s3_prefix in ("", "."):
        raise ValueError("prefix cannot be empty")
    if "/" not in s3_prefix:
        raise ValueError("prefix must contain at least one '/'")
    if "//" in s3_prefix:
        raise ValueError("prefix cannot contain double slashes")
    urn = BASE_URN
    for part in s3_prefix.split("/"):
        if part == "":
            break
        urn += ":" + part
    return urn


def _text_before_last_dot(s: str) -> str:
    """helpers.go getTextBeforeDot: LAST-dot semantics ('a.b.c' -> 'a.b')."""
    n = s.rfind(".")
    return s if n == -1 else s[:n]


def make_release_nq_name(prefix: str) -> str:
    """Route a storage prefix to its release-graph filename
    (helpers.go:29-52: join tail segments with '_', path.Base, text before
    the LAST dot — no underscore stripping)."""
    parts = prefix.split("/")
    if len(parts) <= 1:
        raise ValueError(f"prefix {prefix} did not contain a slash and thus is ambiguous")
    base = "_".join(parts[1:])
    name = _text_before_last_dot(base) if base else ""
    if "summoned" in parts and name:
        return f"{name}_release.nq"
    if "prov" in parts and name:
        return f"{name}_prov.nq"
    if "orgs" in parts:
        return f"{name}_organizations.nq" if name else "organizations.nq"
    raise ValueError(f"unable to form a release graph name from ambiguous prefix {prefix}")
