"""Graph-level operators over materialized (subj, pred, obj, prov) tables:
owl:sameAs canonicalization, release diffing, and referential-integrity QA.

These are the post-materialization operations a production KG pipeline runs
on the triple tables the extract stage commits (BASELINE north_star: "link
and canonicalize entity mentions ... materialize the graph as partitioned
(subj, pred, obj, prov) tables"):

  * ``sameas_closure`` — connected components over owl:sameAs assertions,
    canonical = lexicographically smallest IRI per component. Reuses the
    pointer-jumping min-label CC from the dedup family (``dedup_clusters``
    is type-generic: least/min work on strings), so convergence is
    O(log diameter) rounds of equi-joins.
  * ``rewrite_canonical`` — rewrite subj/obj through the canonical mapping
    (two left joins; literal objects miss the mapping by construction).
  * ``release_diff`` — added/removed quads between two release versions
    (exceptAll both ways: one all-column shuffle per direction) — the
    incremental triplestore-sync feed.
  * ``integrity_report`` — IRI objects never defined as subjects (dangling
    references), with reference counts: the standard KG QA gate before
    bulk-load.

Scale notes (100 TB of pages → ~1e11 triples): every operator here is a
constant number of shuffles on triple-sized relations; sameAs subgraphs are
tiny relative to the corpus (assertions only), and the rewrite join is a
mapping-sized build side that usually broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_clusters

OWL_SAMEAS = "<http://www.w3.org/2002/07/owl#sameAs>"

_QUAD_COLS = ["subj", "pred", "obj", "prov"]


def sameas_edges(quads: DataFrame) -> DataFrame:
    """(id_a, id_b) IRI pairs asserted owl:sameAs (literals excluded)."""
    return (
        quads.filter(F.col("pred") == OWL_SAMEAS)
        .filter(F.col("obj").startswith("<"))
        .select(F.col("subj").alias("id_a"), F.col("obj").alias("id_b"))
    )


def sameas_closure(edges: DataFrame, *, max_iters: int = 50) -> DataFrame:
    """(iri, canonical_iri) for every IRI in a sameAs component — the
    transitive, symmetric closure with the smallest member as canonical."""
    labels = dedup_clusters(
        edges.select("id_a", "id_b"), max_iters=max_iters
    )
    return labels.select(
        F.col("id").alias("iri"), F.col("cluster_id").alias("canonical_iri")
    )


def rewrite_canonical(quads: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj and obj through (iri, canonical_iri); sameAs assertions
    themselves are dropped (they are now self-referential). The mapping is
    component-sized — broadcast when small, shuffle-joined otherwise (left
    to AQE)."""
    m_subj = mapping.select(
        F.col("iri").alias("subj"), F.col("canonical_iri").alias("_cs")
    )
    m_obj = mapping.select(
        F.col("iri").alias("obj"), F.col("canonical_iri").alias("_co")
    )
    return (
        quads.filter(F.col("pred") != OWL_SAMEAS)
        .join(m_subj, "subj", "left")
        .join(m_obj, "obj", "left")
        .select(
            F.coalesce("_cs", "subj").alias("subj"),
            "pred",
            F.coalesce("_co", "obj").alias("obj"),
            "prov",
        )
    )


def release_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(change, subj, pred, obj, prov) with change ∈ {added, removed}:
    the exact delta between two release versions."""
    o, n = old.select(_QUAD_COLS), new.select(_QUAD_COLS)
    added = n.exceptAll(o).withColumn("change", F.lit("added"))
    removed = o.exceptAll(n).withColumn("change", F.lit("removed"))
    return added.unionByName(removed).select("change", *_QUAD_COLS)


def integrity_report(quads: DataFrame) -> DataFrame:
    """(obj, n_refs): IRI objects referenced but never defined as a subject
    anywhere in the graph — dangling references. Schema/ontology IRIs show
    up here by design (they are defined elsewhere); domain IRIs appearing
    are the actual QA signal."""
    objs = (
        quads.filter(F.col("obj").startswith("<"))
        .groupBy("obj")
        .agg(F.count("*").alias("n_refs"))
    )
    subjects = quads.select(F.col("subj").alias("obj")).distinct()
    return objs.join(subjects, "obj", "left_anti")
