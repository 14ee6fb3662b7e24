"""Entity linking & mention canonicalization (north-star addition beyond the
reference): link schema:name mentions to a broadcast dictionary of known
IRIs, exact-first then MinHash-LSH blocking over character 3-grams for fuzzy
surface forms, and materialize owl:sameAs canonicalization quads.

Spark design:
  * the dictionary is small relative to the corpus (known-IRI registries are
    millions of rows, not trillions) -> broadcast; exact matches are one
    broadcast hash join on the normalized surface form, no shuffle;
  * fuzzy path: dictionary minhash signatures are precomputed once on the
    driver (numpy) and shipped in the UDF closure (the "broadcast dictionary"
    of the north star); each unmatched mention computes its signature and
    probes band buckets in-process — candidates are O(bucket), and the whole
    fuzzy pass is one mapInPandas with NO join/shuffle;
  * for dictionaries too large to broadcast, the banding equi-join in
    operators/dedup.py is the drop-in alternative (same signatures).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .dedup import _perm_params, minhash_signature

SCHEMA_NAME_PRED = "<https://schema.org/name>"
SAME_AS_PRED = "<http://www.w3.org/2002/07/owl#sameAs>"

_WS_RE = re.compile(r"\s+")


def normalize_mention(s: str) -> str:
    return _WS_RE.sub(" ", s.strip().lower().replace("_", " "))


def char_shingles(s: str, k: int = 3) -> set[int]:
    import hashlib

    s = normalize_mention(s)
    if len(s) < k:
        # md5 here too: the dictionary index is built driver-side (random
        # PYTHONHASHSEED) while mentions hash in executors (seed pinned 0) —
        # builtin hash() would silently never match short surface forms
        return (
            {int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")}
            if s
            else set()
        )
    return {
        int.from_bytes(hashlib.md5(s[i : i + k].encode()).digest()[:8], "big")
        for i in range(len(s) - k + 1)
    }


class DictionaryIndex:
    """Driver-side LSH index over the known-IRI dictionary, shipped to
    executors inside the UDF closure (broadcast semantics)."""

    def __init__(
        self,
        surface_forms: list[tuple[str, str]],
        *,
        num_perm: int = 64,
        bands: int = 16,
        seed: int = 42,
    ):
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)
        self.exact: dict[str, str] = {}
        self.forms: list[tuple[str, str, set[int]]] = []
        self.buckets: dict[tuple[int, bytes], list[int]] = {}
        for iri, form in surface_forms:
            norm = normalize_mention(form)
            self.exact.setdefault(norm, iri)
            sh = char_shingles(form)
            idx = len(self.forms)
            self.forms.append((iri, norm, sh))
            sig = minhash_signature(sh, self.a, self.b)
            for band in range(bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                self.buckets.setdefault((band, chunk.tobytes()), []).append(idx)

    def link(
        self, mention: str, threshold: float = 0.5, max_candidates: int = 64
    ) -> tuple[str | None, float, str]:
        """(iri, score, method) — method in {exact, fuzzy, none}.

        Work per mention is bounded: candidates are ranked by band-collision
        count and only the top ``max_candidates`` get an exact Jaccard — the
        guardrail for degenerate dictionaries whose surface forms are
        near-identical (all sharing buckets)."""
        norm = normalize_mention(mention)
        if norm in self.exact:
            return self.exact[norm], 1.0, "exact"
        sh = char_shingles(mention)
        if not sh:
            return None, 0.0, "none"
        sig = minhash_signature(sh, self.a, self.b)
        collisions: dict[int, int] = {}
        for band in range(self.bands):
            chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
            for idx in self.buckets.get((band, chunk.tobytes()), ()):
                collisions[idx] = collisions.get(idx, 0) + 1
        cand = sorted(collisions, key=lambda i: (-collisions[i], self.forms[i][0]))
        best_iri, best_j = None, 0.0
        for idx in cand[:max_candidates]:
            iri, _, dsh = self.forms[idx]
            union = len(sh | dsh)
            j = len(sh & dsh) / union if union else 0.0
            if j > best_j or (j == best_j and best_iri is not None and iri < best_iri):
                best_iri, best_j = iri, j
        if best_iri is not None and best_j >= threshold:
            return best_iri, best_j, "fuzzy"
        return None, 0.0, "none"


LINKED_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("mention", T.StringType()),
        T.StructField("iri", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("method", T.StringType()),
    ]
)


def extract_mentions(quads: DataFrame) -> DataFrame:
    """(subj, mention) pairs from schema:name literal objects."""
    return quads.filter(F.col("pred") == SCHEMA_NAME_PRED).select(
        "subj",
        F.regexp_extract(F.col("obj"), r'^"((?:[^"\\]|\\.)*)"', 1).alias("mention"),
    ).filter(F.col("mention") != "").distinct()


def link_mentions(
    mentions: DataFrame,
    known_iris: DataFrame,
    *,
    threshold: float = 0.5,
) -> DataFrame:
    """(subj, mention, iri, score, method) — one mapInPandas, no shuffle."""
    dict_rows = [
        (r["iri"], r["surface_form"])
        for r in known_iris.select("iri", "surface_form").collect()
    ]
    index = DictionaryIndex(dict_rows)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            iris, scores, methods = [], [], []
            for m in pdf["mention"]:
                iri, score, method = index.link(m or "", threshold)
                iris.append(iri)
                scores.append(round(score, 6))
                methods.append(method)
            yield pd.DataFrame(
                {
                    "subj": pdf["subj"],
                    "mention": pdf["mention"],
                    "iri": iris,
                    "score": scores,
                    "method": methods,
                }
            )

    return mentions.mapInPandas(batches, LINKED_SCHEMA)


def same_as_quads(linked: DataFrame, quads: DataFrame) -> DataFrame:
    """owl:sameAs canonicalization quads for linked mentions, tagged with the
    subject's original prov graph (and any extra partition columns the quads
    table carries, e.g. host)."""
    extra = [c for c in quads.columns if c not in ("subj", "pred", "obj", "prov")]
    provs = quads.select("subj", "prov", *extra).dropDuplicates(["subj"])
    return (
        linked.filter(F.col("iri").isNotNull())
        .join(provs, "subj", "left")
        .select(
            "subj",
            F.lit(SAME_AS_PRED).alias("pred"),
            F.concat(F.lit("<"), F.col("iri"), F.lit(">")).alias("obj"),
            "prov",
            *extra,
        )
    )


def link_and_canonicalize(
    quads: DataFrame, known_iris: DataFrame, *, threshold: float = 0.5
) -> dict:
    """Full entity-linking pass over a quads table: returns the mapping table
    and the graph with owl:sameAs edges appended."""
    mentions = extract_mentions(quads)
    linked = link_mentions(mentions, known_iris, threshold=threshold)
    sameas = same_as_quads(linked, quads)
    return {
        "linked": linked,
        "same_as": sameas,
        "quads_with_links": quads.unionByName(sameas),
    }
