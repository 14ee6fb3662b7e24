"""RDFS-lite inference materialization over triple DataFrames.

The reference ships asserted graphs to a triplestore and leaves
entailment to the endpoint (/root/reference/internal/synchronizer —
studied, not copied); this operator materializes the practical RDFS
closure natively so downstream consumers (SPARQL engine, releases,
views) can query entailed triples without a reasoning endpoint.

Rules covered (the classic ρdf / RDFS-Plus core):

    rdfs5   subPropertyOf transitivity
    rdfs7   (p subPropertyOf q) ∧ (s p o)      → (s q o)
    rdfs2   (p domain c)        ∧ (s p o)      → (s rdf:type c)
    rdfs3   (p range  c)        ∧ (s p o)      → (o rdf:type c)   [o IRI/bnode]
    rdfs9   (c subClassOf d)    ∧ (x rdf:type c) → (x rdf:type d)
    rdfs11  subClassOf transitivity

Documented boundaries (each the standard production choice):
- Schema triples are those literally asserted (no meta-level inference
  such as a subPropertyOf of rdfs:subClassOf itself).
- rdfs3 is not applied to literal objects (no literal class instances).
- Axiomatic container/annotation rules (rdfs1/4/6/8/10/12/13) are out of
  scope — they only add schema-vocabulary tautologies.

With that stratification the closure needs NO fixpoint over the data:
property hierarchy first (its transitive closure is computed once by
pointer doubling over the tiny schema edge set), then domain/range over
the property-closed data, then the class hierarchy over all type
triples. Each application is one broadcast join of the data against a
closed schema relation — the data is scanned a bounded number of times
and never shuffled on its own keys, the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS = f"<{RDFS}subClassOf>"
SUBPROP = f"<{RDFS}subPropertyOf>"
DOMAIN = f"<{RDFS}domain>"
RANGE = f"<{RDFS}range>"

_MAX_ROUNDS = 32


def transitive_closure(edges: DataFrame, *,
                       driver_max: int = 20_000) -> DataFrame:
    """Strict transitive closure of a (child, parent) edge relation.

    Schema vocabularies are small by nature, so edge sets up to
    ``driver_max`` close in-memory (one bounded collect, BFS per node)
    and ship back as one broadcastable relation — this saves ~8 Spark
    jobs of fixed fixpoint overhead per closure. Larger relations fall
    through to pointer doubling — ceil(log2 diameter) self-join rounds,
    each localCheckpoint-ed so lineage stays bounded (same kernel as the
    SPARQL path engine). Pass ``driver_max=0`` to force the distributed
    path."""
    deduped = edges.select("child", "parent").distinct()
    if driver_max:
        rows = deduped.limit(driver_max + 1).collect()
        if len(rows) <= driver_max:
            adj: dict[str, set] = {}
            for r in rows:
                adj.setdefault(r.child, set()).add(r.parent)
            closed: set[tuple[str, str]] = set()
            for start in adj:
                stack, seen = list(adj[start]), set()
                while stack:
                    n = stack.pop()
                    if n in seen:
                        continue
                    seen.add(n)
                    closed.add((start, n))
                    stack.extend(adj.get(n, ()))
            return edges.sparkSession.createDataFrame(
                sorted(closed), "child string, parent string")
    result = deduped.localCheckpoint(eager=True)
    prev = result.count()
    for _ in range(_MAX_ROUNDS):
        doubled = (
            result.select("child", F.col("parent").alias("__m"))
            .join(result.select(F.col("child").alias("__m"), "parent"),
                  on="__m")
            .select("child", "parent")
            .unionByName(result)
            .distinct()
            .localCheckpoint(eager=True)
        )
        cnt = doubled.count()
        if cnt == prev:
            return doubled
        result, prev = doubled, cnt
    raise RuntimeError(f"closure did not converge in {_MAX_ROUNDS} rounds")


def _edges(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("child"), F.col("obj").alias("parent"))


def rdfs_materialize(triples: DataFrame) -> DataFrame:
    """The entailed graph: asserted (subj, pred, obj) triples plus every
    triple the rules above derive, as one distinct relation."""
    t = triples.select("subj", "pred", "obj")

    spo = transitive_closure(_edges(t, SUBPROP))
    sco = transitive_closure(_edges(t, SUBCLASS))

    # rdfs7 over the CLOSED property hierarchy (covers rule chains)
    derived_prop = (
        t.join(F.broadcast(spo), t["pred"] == spo["child"])
        .select("subj", F.col("parent").alias("pred"), "obj")
    )
    data_p = t.unionByName(derived_prop)

    # rdfs2 / rdfs3 over the property-closed data
    dom = _edges(t, DOMAIN)
    rng = _edges(t, RANGE)
    types_dom = (
        data_p.join(F.broadcast(dom), data_p["pred"] == dom["child"])
        .select("subj", F.lit(RDF_TYPE).alias("pred"),
                F.col("parent").alias("obj"))
    )
    types_rng = (
        data_p.filter(~F.col("obj").startswith('"'))
        .join(F.broadcast(rng), data_p["pred"] == rng["child"])
        .select(F.col("obj").alias("subj"), F.lit(RDF_TYPE).alias("pred"),
                F.col("parent").alias("obj"))
    )

    # rdfs9 over ALL type triples (asserted + property/domain/range derived)
    all_types = (
        data_p.filter(F.col("pred") == RDF_TYPE)
        .unionByName(types_dom).unionByName(types_rng)
    )
    types_up = (
        all_types.join(F.broadcast(sco), all_types["obj"] == sco["child"])
        .select("subj", F.lit(RDF_TYPE).alias("pred"),
                F.col("parent").alias("obj"))
    )

    # rdfs5/11: the closed hierarchies themselves are entailed triples
    schema_closed = (
        spo.select("child", F.lit(SUBPROP).alias("pred"), "parent")
        .unionByName(sco.select("child", F.lit(SUBCLASS).alias("pred"),
                                "parent"))
        .select(F.col("child").alias("subj"), "pred",
                F.col("parent").alias("obj"))
    )

    return (
        data_p.unionByName(types_dom).unionByName(types_rng)
        .unionByName(types_up).unionByName(schema_closed)
        .distinct()
    )
