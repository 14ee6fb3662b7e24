"""Precision/recall scoring of emitted triples against a reference oracle.

The north rule requires P/R >= 0.95 of emitted (subj, pred, obj) triples vs
the reference's output. Two oracles exist here:

  * the reference's own golden release file (exact expected quads) — parity
    is byte-level, so P = R = 1.0 by construction (asserted in tests);
  * the single-process oracle: the same pure-Python kernels run driver-side
    over the corpus — distribution-invariance of the Spark pipeline.

``triple_pr`` compares (subj, pred, obj) multisets-as-sets per graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def triple_pr(emitted: set, expected: set) -> dict:
    tp = len(emitted & expected)
    precision = tp / len(emitted) if emitted else 0.0
    recall = tp / len(expected) if expected else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "emitted": len(emitted),
        "expected": len(expected),
        "true_positives": tp,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
    }


def quads_pr(emitted_df: DataFrame, expected: set, *, with_prov: bool = True) -> dict:
    cols = ["subj", "pred", "obj"] + (["prov"] if with_prov else [])
    emitted = {tuple(r) for r in emitted_df.select(*cols).collect()}
    return triple_pr(emitted, expected)
