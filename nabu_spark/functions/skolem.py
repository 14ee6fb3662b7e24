"""Deterministic blank-node skolemization.

Semantics mirrored exactly from the reference's Skolemization
(/root/reference/internal/common/urn.go:54-130): per document graph, every
blank node's "context" is the multiset of

  - ``predicate + object-token`` for each line where it is the subject, and
  - ``subject + predicate`` for each line where it is the object,

where tokens come from splitting the N-Triples line on single spaces and
taking fields [0], [1], [2] — so a literal object containing spaces is
truncated at its first space, exactly as in the reference (this is part of
the hash preimage and therefore P/R-critical). The contexts are sorted,
joined with ``\\n``, sha256-hashed, and the blank node is replaced by
``<https://docs.geoconnex.us/nqhash/{hex}>``.

Golden: single-triple case hashes to 0adc62bd... (urn.go tests), and the
nqhash IRIs in /root/reference/cmd/nabu/testdata/iow_wqp_stations__5_release.nq
reproduce byte-for-byte (verified in tests/test_skolem.py).

Blank nodes never cross document boundaries, so this runs doc-locally inside
the extraction Arrow UDF — no shuffle.
"""

from __future__ import annotations

import hashlib

SKOLEM_PREFIX = "https://docs.geoconnex.us/nqhash/"


def skolem_map_from_lines(lines: list[str]) -> dict[str, str]:
    """Map blank-node label -> skolem IRI term (``<...>``), from raw NT lines."""
    contexts: dict[str, list[str]] = {}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        parts = line.split(" ")
        if len(parts) < 3:
            raise ValueError(f"triple must have at least 3 parts, unexpectedly got: '{line}'")
        subj, pred, obj = parts[0], parts[1], parts[2]
        if subj.startswith("_:"):
            contexts.setdefault(subj, []).append(pred + obj)
        if obj.startswith("_:"):
            contexts.setdefault(obj, []).append(subj + pred)
    mapping: dict[str, str] = {}
    for bnode, ctxs in contexts.items():
        ctxs.sort()
        digest = hashlib.sha256("\n".join(ctxs).encode("utf-8")).hexdigest()
        mapping[bnode] = f"<{SKOLEM_PREFIX}{digest}>"
    return mapping


def skolemize_terms(
    triples: list[tuple[str, str, str]],
) -> list[tuple[str, str, str]]:
    """Skolemize a doc-local list of (subj, pred, obj) serialized terms.

    Operates on parsed terms (strictly safer than the reference's string
    replace on ``_:x `` / ``_:x .`` boundaries, urn.go:122-127) while keeping
    the identical hash preimage: subjects and predicates are space-free
    terms, so the reference's space-split tokens [0],[1],[2] are exactly
    (subj, pred, first-space-token-of-obj) — computed here without building
    lines (tests lock equality with skolem_map_from_lines).
    """
    contexts: dict[str, list[str]] = {}
    touched: list[int] = []  # indices of triples containing a blank node
    for i, (s, p, o) in enumerate(triples):
        hit = False
        if s[:2] == "_:":
            obj_token = o.split(" ", 1)[0]
            contexts.setdefault(s, []).append(p + obj_token)
            hit = True
        if o[:2] == "_:":
            contexts.setdefault(o, []).append(s + p)
            hit = True
        if hit:
            touched.append(i)
    if not contexts:
        return triples
    mapping: dict[str, str] = {}
    for bnode, ctxs in contexts.items():
        ctxs.sort()
        digest = hashlib.sha256("\n".join(ctxs).encode("utf-8")).hexdigest()
        mapping[bnode] = f"<{SKOLEM_PREFIX}{digest}>"
    # patch only the touched triples — the list is doc-local and fresh
    out = list(triples)
    for i in touched:
        s, p, o = out[i]
        out[i] = (mapping.get(s, s), p, mapping.get(o, o))
    return out


def skolemize_nt(nt: str) -> str:
    """String-level variant matching the reference signature (tests/parity)."""
    lines = nt.split("\n")
    mapping = skolem_map_from_lines([ln for ln in lines if ln.strip()])
    out = nt
    for blank, iri in mapping.items():
        out = out.replace(blank + " ", iri + " ").replace(blank + " .", iri + " .")
    return out
