"""SPARQL 1.1 Update over quad DataFrames + a snapshot-versioned graph store.

The reference's end state is an external triplestore: the synchronizer
builds release graphs and the downstream endpoint applies them
(/root/reference/internal/synchronizer — studied, not copied). This module
keeps that last hop native too: the materialized quad table IS the
triplestore. Updates are expressed in SPARQL 1.1 Update, compiled to the
same Catalyst plans the SELECT engine uses, and committed as atomic
snapshots with time travel and rollback.

Supported Update grammar (SPARQL 1.1 Update subset):

    PREFIX pfx: <iri>
    INSERT DATA { quads }            DELETE DATA { quads }
    DELETE WHERE { quad pattern }
    [WITH <g>] DELETE { tmpl } INSERT { tmpl } WHERE { pattern }
    [WITH <g>] DELETE { tmpl } WHERE { pattern }
    [WITH <g>] INSERT { tmpl } WHERE { pattern }
    (DELETE/INSERT templates may be followed by USING [NAMED] <g>* —
     the WHERE then evaluates against that dataset exactly as a query's
     FROM/FROM NAMED would, and WITH is ignored for the WHERE)
    LOAD [SILENT] <path-or-file-iri> [INTO GRAPH <g>]
    CLEAR  [SILENT] (GRAPH <g> | DEFAULT | NAMED | ALL)
    DROP   [SILENT] (GRAPH <g> | DEFAULT | NAMED | ALL)
    CREATE [SILENT] GRAPH <g>
    (COPY | MOVE | ADD) [SILENT] (DEFAULT | [GRAPH] <g>) TO (DEFAULT | [GRAPH] <g>)
    op ; op ; ...                    (sequences apply left to right)

`quads` blocks contain triples and `GRAPH <g> { triples }` sections; WHERE
groups support the full SELECT-engine pattern algebra (OPTIONAL, UNION,
FILTER, paths, ...).

Documented semantics choices (each pinned by tests):

- The store is a SET of quads (subj, pred, obj, prov); prov NULL is the
  default graph. A bare triple pattern in WHERE matches quads in ALL
  graphs (the "union default graph" convention most triplestores ship);
  GRAPH <g>/?g scopes to named graphs.
- DROP == CLEAR and CREATE is a no-op: the store tracks no empty graphs
  (a graph exists iff it has quads), which the Update spec explicitly
  allows for such stores.
- Blank nodes in INSERT templates are fresh per solution, realized as a
  deterministic hash of (label, template-variable bindings) so the result
  is cluster-size independent and identical across both backends. Blank
  nodes are illegal in DELETE templates and DELETE DATA (per spec).
- Template quads whose variables are unbound in a solution, or that
  instantiate a literal into subject/predicate or graph position, are
  skipped (spec: "such quads are not included").

Scale shape: one update compiles to (a) the WHERE plan — N filtered scans
of the quad table joined on shared variables, same as the SELECT engine —
(b) a left-anti join of the store against the (usually small, AQE can
broadcast it) instantiated delete set, and (c) a union with the
deduplicated insert set. Nothing is collected; ``GraphStore`` commits only
the DELTA rows (Iceberg-v2-style equality-delete markers, merged at read
with one max_by aggregation) so a 100-TB store is never rewritten by a
small update — ``compact()`` folds the log back to a pure add set.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sparql import (
    Group,
    SparqlError,
    _DfCompiler,
    _LocalEval,
    _Parser,
)

QUAD_COLS = ("subj", "pred", "obj", "prov")


# ---------------------------------------------------------------------------
# parsed operations
# ---------------------------------------------------------------------------


@dataclass
class Modify:
    """DELETE/INSERT [DATA] — templates are lists of (graph_atom|None,
    s, p, o); ``where`` is None for the ground DATA forms. ``using`` is
    the (from_graphs, from_named) dataset the WHERE evaluates against
    (USING/USING NAMED, §3.1.3 — when present, WITH is ignored for the
    WHERE but still names the templates' default destination)."""

    delete: list | None
    insert: list | None
    where: Group | None
    with_graph: str | None = None
    using: tuple | None = None


@dataclass
class GraphMgmt:
    op: str                  # clear | drop | create | copy | move | add
    src: object = None       # 'DEFAULT' | 'NAMED' | 'ALL' | '<iri>'
    dst: object = None
    silent: bool = False


@dataclass
class Load:
    path: str
    graph: str | None
    silent: bool


class _UpdateParser(_Parser):
    """Reuses the SELECT engine's tokenizer, prefix handling, term atoms,
    triples blocks and group-graph-pattern parser."""

    def _term_atom(self):
        kind, v = self._peek()
        if kind == "PNAME" and v.startswith("_:"):
            self.i += 1
            return ("term", v)  # blank node label
        return super()._term_atom()

    def _iri(self) -> str:
        atom = self._term_atom()
        if atom[0] != "term" or not atom[1].startswith("<"):
            raise SparqlError(f"expected an IRI, got {atom!r}")
        return atom[1]

    def _quad_triples(self, gatom, quads: list) -> None:
        """One '{ triples }' body appended to ``quads`` under ``gatom``."""
        self._expect("{")
        g = Group()
        while self._peek()[1] != "}":
            self._triples_block(g)
            while self._peek()[1] == ".":
                self.i += 1
        self.i += 1
        for it in g.items:
            if it[0] != "triple" or it[2][0] == "path":
                raise SparqlError("quad templates allow only plain triples "
                                  "(no property paths)")
            quads.append((gatom, it[1], it[2], it[3]))

    def _quad_block(self) -> list:
        """'{' (triples | GRAPH g '{' triples '}')* '}' ->
        [(graph_atom|None, s, p, o), ...]"""
        self._expect("{")
        quads: list = []
        while True:
            kind, v = self._peek()
            if v == "}":
                self.i += 1
                return quads
            if kind == "NAME" and v.upper() == "GRAPH":
                self.i += 1
                gatom = self._term_atom()
                if gatom[0] == "term" and gatom[1].startswith('"'):
                    raise SparqlError("graph label must be an IRI or variable")
                self._quad_triples(gatom, quads)
            else:
                g = Group()
                self._triples_block(g)
                for it in g.items:
                    if it[0] != "triple" or it[2][0] == "path":
                        raise SparqlError("quad templates allow only plain "
                                          "triples (no property paths)")
                    quads.append((None, it[1], it[2], it[3]))
            while self._peek()[1] == ".":
                self.i += 1

    def _graph_ref(self):
        if self._kw("DEFAULT"):
            return "DEFAULT"
        if self._kw("NAMED"):
            return "NAMED"
        if self._kw("ALL"):
            return "ALL"
        self._kw("GRAPH")
        return self._iri()

    def _graph_or_default(self):
        if self._kw("DEFAULT"):
            return "DEFAULT"
        self._kw("GRAPH")
        return self._iri()

    def parse_update(self) -> list:
        ops: list = []
        while True:
            while self._kw("PREFIX"):
                kind, pname = self._next()
                if kind != "PNAME" or not pname.endswith(":"):
                    raise SparqlError(f"bad PREFIX name {pname!r}")
                kind, iri = self._next()
                if kind != "IRI":
                    raise SparqlError(f"bad PREFIX iri {iri!r}")
                self.prefixes[pname[:-1]] = iri[1:-1]
            if self._peek()[0] == "EOF":
                return ops
            ops.append(self._operation())
            if self._peek()[1] == ";":
                self.i += 1
            elif self._peek()[0] != "EOF":
                raise SparqlError(
                    f"expected ';' between operations, got {self._peek()[1]!r}"
                )

    def _operation(self):
        if self._kw("LOAD"):
            silent = self._kw("SILENT")
            iri = self._iri()
            graph = None
            if self._kw("INTO"):
                self._expect("GRAPH")
                graph = self._iri()
            return Load(iri[1:-1], graph, silent)
        for word in ("CLEAR", "DROP"):
            if self._kw(word):
                silent = self._kw("SILENT")
                return GraphMgmt(word.lower(), self._graph_ref(),
                                 silent=silent)
        if self._kw("CREATE"):
            silent = self._kw("SILENT")
            self._expect("GRAPH")
            return GraphMgmt("create", self._iri(), silent=silent)
        for word in ("COPY", "MOVE", "ADD"):
            if self._kw(word):
                silent = self._kw("SILENT")
                src = self._graph_or_default()
                self._expect("TO")
                return GraphMgmt(word.lower(), src, self._graph_or_default(),
                                 silent)
        with_graph = None
        if self._kw("WITH"):
            with_graph = self._iri()
        if self._kw("INSERT"):
            if with_graph is None and self._kw("DATA"):
                quads = self._quad_block()
                self._no_vars(quads, "INSERT DATA")
                return Modify(None, quads, None)
            insert = self._quad_block()
            using = self._using_clause()
            self._expect("WHERE")
            return Modify(None, insert, self._group(), with_graph, using)
        if self._kw("DELETE"):
            if with_graph is None and self._kw("DATA"):
                quads = self._quad_block()
                self._no_vars(quads, "DELETE DATA")
                self._no_bnodes(quads, "DELETE DATA")
                return Modify(quads, None, None)
            if self._kw("WHERE"):
                quads = self._quad_block()
                self._no_bnodes(quads, "DELETE WHERE")
                return Modify(quads, None, _pattern_group(quads), with_graph)
            delete = self._quad_block()
            self._no_bnodes(delete, "DELETE templates")
            insert = None
            if self._kw("INSERT"):
                insert = self._quad_block()
            using = self._using_clause()
            self._expect("WHERE")
            return Modify(delete, insert, self._group(), with_graph, using)
        raise SparqlError(f"unknown update operation at {self._peek()[1]!r}")

    def _using_clause(self):
        """USING [NAMED] <iri>* → (from_graphs, from_named) | None. Same
        shape as the SELECT engine's FROM clause (§3.1.3: USING is to
        updates what FROM is to queries)."""
        ug = un = None
        while self._kw("USING"):
            if self._kw("NAMED"):
                un = (un or []) + [self._iri()]
            else:
                ug = (ug or []) + [self._iri()]
        return (ug, un) if (ug is not None or un is not None) else None

    @staticmethod
    def _no_vars(quads, where):
        for q in quads:
            for atom in q:
                if atom is not None and atom[0] == "var":
                    raise SparqlError(f"variables are not allowed in {where}")

    @staticmethod
    def _no_bnodes(quads, where):
        for q in quads:
            for atom in q:
                if (atom is not None and atom[0] == "term"
                        and atom[1].startswith("_:")):
                    raise SparqlError(
                        f"blank nodes are not allowed in {where}")


def _pattern_group(quads: list) -> Group:
    """DELETE WHERE's quad pattern doubles as its WHERE group."""
    g = Group()
    for ga, s, p, o in quads:
        if ga is None:
            g.items.append(("triple", s, p, o))
        else:
            g.items.append(("graph", ga, Group([("triple", s, p, o)])))
    return g


def parse_update(text: str) -> list:
    p = _UpdateParser(text)
    ops = p.parse_update()
    if not ops:
        raise SparqlError("empty update")
    return ops


# ---------------------------------------------------------------------------
# template instantiation + set algebra (DataFrame backend)
# ---------------------------------------------------------------------------


def _template_vars(quads: list) -> list[str]:
    """Variables a template mentions, sorted — the blank-node freshness
    hash domain (identical on both backends)."""
    vs: set[str] = set()
    for q in quads:
        for atom in q:
            if atom is not None and atom[0] == "var":
                vs.add(atom[1])
    return sorted(vs)


def _bnode_hash_col(label: str, hash_vars: list[str], cols: set[str]):
    parts = [F.lit(label)]
    for v in hash_vars:
        c = F.col(v) if v in cols else F.lit(None).cast("string")
        parts.append(F.coalesce(c, F.lit("\x00")))
    return F.concat(
        F.lit("_:u"),
        F.substring(F.sha2(F.concat_ws("\x1f", *parts), 256), 1, 16),
    )


def _instantiate(sol: DataFrame, quads: list, with_graph: str | None,
                 *, fresh_bnodes: bool) -> DataFrame | None:
    """Instantiate template quads against a solution relation. Returns a
    distinct (subj, pred, obj, prov) DataFrame or None if nothing can
    instantiate. Unbound variables and ill-typed positions skip the quad,
    not the operation."""
    hash_vars = _template_vars(quads)
    cols = set(sol.columns)
    parts: list[DataFrame] = []
    for ga, s, p, o in quads:
        gatom = ga if ga is not None else (
            ("term", with_graph) if with_graph else None)
        exprs, needed, skip = [], [], False
        for atom, name in ((s, "subj"), (p, "pred"), (o, "obj"),
                           (gatom, "prov")):
            if atom is None:
                exprs.append(F.lit(None).cast("string").alias(name))
                continue
            if atom[0] == "term":
                t = atom[1]
                if t.startswith("_:"):
                    if not fresh_bnodes:
                        raise SparqlError(
                            "blank nodes are not allowed in DELETE templates")
                    exprs.append(
                        _bnode_hash_col(t, hash_vars, cols).alias(name))
                else:
                    exprs.append(F.lit(t).alias(name))
            else:
                if atom[1] not in cols:
                    skip = True  # statically unbound: template quad is dead
                    break
                exprs.append(F.col(atom[1]).alias(name))
                needed.append(atom[1])
        if skip:
            continue
        part = sol
        for v in needed:
            part = part.filter(F.col(v).isNotNull())
        parts.append(part.select(*exprs))
    if not parts:
        return None
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    # spec: quads instantiating a literal/blank into an illegal position
    # are skipped
    out = out.filter(
        F.col("subj").rlike("^[<_]")
        & F.col("pred").startswith("<")
        & (F.col("prov").isNull() | F.col("prov").rlike("^[<_]"))
    )
    return out.distinct()


def _quad_minus(a: DataFrame, b: DataFrame | None) -> DataFrame:
    """a \\ b on the four quad columns; prov compares null-safe so the
    default graph participates."""
    if b is None:
        return a
    bb = b.select(*[F.col(c).alias("__r_" + c) for c in QUAD_COLS])
    cond = reduce(
        lambda x, y: x & y,
        [a[c].eqNullSafe(bb["__r_" + c]) for c in QUAD_COLS],
    )
    return a.join(bb, cond, "left_anti")


def _ground_df(spark: SparkSession, quads: list, op_index: int,
               *, fresh_bnodes: bool) -> DataFrame:
    rows = []
    for ga, s, p, o in quads:
        def term(atom):
            if atom is None:
                return None
            t = atom[1]
            if t.startswith("_:"):
                if not fresh_bnodes:
                    raise SparqlError("blank nodes are not allowed here")
                # fresh per operation, deterministic across runs
                h = hashlib.sha256(
                    f"data\x1f{op_index}\x1f{t}".encode()).hexdigest()[:16]
                return "_:u" + h
            return t
        rows.append((term(s), term(p), term(o), term(ga)))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    ).distinct()


def _in_ref(ref):
    """Membership predicate for a graph ref ('DEFAULT'|'NAMED'|'ALL'|<iri>)."""
    if ref == "DEFAULT":
        return F.col("prov").isNull()
    if ref == "NAMED":
        return F.col("prov").isNotNull()
    if ref == "ALL":
        return F.lit(True)
    return F.col("prov").eqNullSafe(F.lit(ref))


def _ref_lit(ref):
    return F.lit(None).cast("string") if ref == "DEFAULT" else F.lit(ref)


def _apply_one(cur: DataFrame, op, op_index: int,
               graph_col: str = "prov"):
    """Apply one parsed operation to the current view. Returns
    (new_view, delete_df|None, insert_df|None) — the deltas are what a
    merge-on-read store commits."""
    spark = cur.sparkSession
    if isinstance(op, Load):
        adds = _load_quads(spark, op)
        if adds is None:
            return cur, None, None
        adds = _quad_minus(adds.distinct(), cur)
        return cur.unionByName(adds), None, adds
    if isinstance(op, GraphMgmt):
        if op.op == "create":
            return cur, None, None  # no empty-graph tracking (documented)
        if op.op in ("clear", "drop"):
            dels = cur.filter(_in_ref(op.src))
            return cur.filter(~_in_ref(op.src)), dels, None
        if op.src == op.dst:
            return cur, None, None  # COPY/MOVE/ADD g TO g is a no-op (spec)
        moved = (cur.filter(_in_ref(op.src))
                 .withColumn("prov", _ref_lit(op.dst)))
        if op.op == "add":
            adds = _quad_minus(moved, cur)
            return cur.unionByName(adds), None, adds
        drop_ref = (_in_ref(op.dst) | _in_ref(op.src)) if op.op == "move" \
            else _in_ref(op.dst)
        dels = cur.filter(drop_ref)
        base = cur.filter(~drop_ref)
        return base.unionByName(moved), dels, moved
    # Modify
    if op.where is None:
        dels = (_ground_df(spark, op.delete, op_index, fresh_bnodes=False)
                if op.delete else None)
        adds = (_ground_df(spark, op.insert, op_index, fresh_bnodes=True)
                if op.insert else None)
    else:
        ug, un = op.using or (None, None)
        comp = _DfCompiler(cur, graph_col, ug, un)
        # USING replaces WITH for WHERE evaluation (§3.1.3); WITH still
        # names the templates' default destination below
        g = (("term", op.with_graph)
             if op.with_graph and op.using is None else None)
        sol = comp.group(op.where, g)
        dels = (_instantiate(sol, op.delete, op.with_graph,
                             fresh_bnodes=False) if op.delete else None)
        adds = (_instantiate(sol, op.insert, op.with_graph,
                             fresh_bnodes=True) if op.insert else None)
    base = _quad_minus(cur, dels)
    if adds is not None:
        adds = _quad_minus(adds, base)
        base = base.unionByName(adds)
    return base, dels, adds


def _load_quads(spark: SparkSession, op: Load) -> DataFrame | None:
    from .sources.nquads import read_nquads

    path = op.path
    if path.startswith("file://"):
        path = path[len("file://"):]
    try:
        # Turtle / TriG are the small-artifact formats (shapes, VoID,
        # reports): parsed driver-side and shipped as one local relation.
        # N-Quads/N-Triples stay the bulk path (distributed line parse).
        if path.endswith(".ttl"):
            from .functions.turtle import parse_turtle

            with open(path) as fh:
                triples = parse_turtle(fh.read())
            return spark.createDataFrame(
                [(s, p, o, op.graph) for s, p, o in triples],
                "subj string, pred string, obj string, prov string")
        if path.endswith(".trig"):
            from .functions.trig import parse_trig

            with open(path) as fh:
                quads = parse_trig(fh.read())
            return spark.createDataFrame(
                [(s, p, o, op.graph if op.graph is not None else g)
                 for s, p, o, g in quads],
                "subj string, pred string, obj string, prov string")
        df = read_nquads(spark, path)
    except Exception:
        if op.silent:
            return None
        raise
    good = df.filter(F.col("error_code").isNull()).select(*QUAD_COLS)
    if op.graph is not None:
        good = good.withColumn("prov", F.lit(op.graph))
    return good


def apply_update(store: DataFrame, text: str) -> DataFrame:
    """Apply a SPARQL Update script to a quad DataFrame (subj, pred, obj,
    prov) and return the new store view. Set semantics; operations apply
    left to right, each seeing the previous one's result."""
    cur = store.select(*QUAD_COLS)
    for i, op in enumerate(parse_update(text)):
        cur, _, _ = _apply_one(cur, op, i)
    return cur


def sync_graphs(store: DataFrame, release: DataFrame,
                prefix: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Make the store's named graphs under ``prefix`` exactly mirror
    ``release`` — the reference's object-store → triplestore sync (graph
    URNs are serialized storage prefixes: /root/reference/internal/common/
    urn.go:16-22 — studied, not copied): orphan graphs are pruned, changed
    graphs replaced, identical graphs untouched, graphs outside the prefix
    never considered.

    Returns (new_view, deletes, inserts). Both deltas are ONE null-safe
    anti-join each — a no-op sync yields empty deltas, so incremental
    re-syncs of a 100-TB store cost two joins scoped to the prefix
    partition, not a rewrite."""
    p = prefix if prefix.startswith("<") else "<" + prefix
    in_scope = F.col("prov").isNotNull() & F.col("prov").startswith(p)
    scoped = store.filter(in_scope).select(*QUAD_COLS)
    rel = release.select(*QUAD_COLS).filter(in_scope).distinct()
    dels = _quad_minus(scoped, rel)
    adds = _quad_minus(rel, scoped)
    # the fixpoint is definitional: outside-prefix rows + the release
    new = store.select(*QUAD_COLS).filter(~in_scope).unionByName(rel)
    return new, dels, adds


# ---------------------------------------------------------------------------
# local twin (agreement testing; mirrors sparql_eval_local)
# ---------------------------------------------------------------------------


def _bnode_hash_local(label: str, hash_vars: list[str], row: dict) -> str:
    parts = [label] + [
        row.get(v) if row.get(v) is not None else "\x00" for v in hash_vars
    ]
    return "_:u" + hashlib.sha256(
        "\x1f".join(parts).encode()).hexdigest()[:16]


def _inst_local(rows: list[dict], quads: list, with_graph: str | None,
                *, fresh_bnodes: bool) -> set:
    hash_vars = _template_vars(quads)
    out: set = set()
    for ga, s, p, o in quads:
        gatom = ga if ga is not None else (
            ("term", with_graph) if with_graph else None)
        for row in rows:
            vals = []
            ok = True
            for atom in (s, p, o, gatom):
                if atom is None:
                    vals.append(None)
                    continue
                if atom[0] == "term":
                    t = atom[1]
                    if t.startswith("_:"):
                        if not fresh_bnodes:
                            raise SparqlError(
                                "blank nodes are not allowed in DELETE "
                                "templates")
                        t = _bnode_hash_local(t, hash_vars, row)
                    vals.append(t)
                else:
                    v = row.get(atom[1])
                    if v is None:
                        ok = False
                        break
                    vals.append(v)
            if not ok:
                continue
            sv, pv, ov, gv = vals
            if sv[0] not in "<_" or not pv.startswith("<"):
                continue
            if gv is not None and gv[0] not in "<_":
                continue
            out.add((sv, pv, ov, gv))
    return out


def apply_update_local(quads, text: str) -> set:
    """In-memory twin of :func:`apply_update` over an iterable of
    (subj, pred, obj, prov) tuples (prov None = default graph). Returns
    the new store as a set of 4-tuples."""
    cur = {tuple(q) for q in quads}
    for i, op in enumerate(parse_update(text)):
        cur = _apply_one_local(cur, op, i)
    return cur


def _eval_where_local(cur: set, where: Group, with_graph,
                      using: tuple | None = None) -> list[dict]:
    triples = [
        (s, p, o) if g is None else (s, p, o, g) for s, p, o, g in cur
    ]
    ug, un = using or (None, None)
    g = ("term", with_graph) if with_graph and using is None else None
    return _LocalEval(triples, ug, un).group(where, [{}], g)


def _apply_one_local(cur: set, op, op_index: int) -> set:
    if isinstance(op, Load):
        raise SparqlError("LOAD is not supported by the local twin")
    if isinstance(op, GraphMgmt):
        if op.op == "create":
            return cur

        def in_ref(q, ref):
            if ref == "DEFAULT":
                return q[3] is None
            if ref == "NAMED":
                return q[3] is not None
            if ref == "ALL":
                return True
            return q[3] == ref

        if op.op in ("clear", "drop"):
            return {q for q in cur if not in_ref(q, op.src)}
        if op.src == op.dst:
            return cur
        dst = None if op.dst == "DEFAULT" else op.dst
        moved = {(s, p, o, dst) for s, p, o, g in cur
                 if in_ref((s, p, o, g), op.src)}
        if op.op == "add":
            return cur | moved
        keep = {q for q in cur if not in_ref(q, op.dst)
                and (op.op != "move" or not in_ref(q, op.src))}
        return keep | moved
    if op.where is None:
        rows = [{}]
    else:
        rows = _eval_where_local(cur, op.where, op.with_graph, op.using)
    if op.where is None:
        # ground DATA forms share the DataFrame backend's per-op bnode hash
        def ground(quads, fresh):
            out = set()
            for ga, s, p, o in quads:
                def term(atom):
                    if atom is None:
                        return None
                    t = atom[1]
                    if t.startswith("_:"):
                        h = hashlib.sha256(
                            f"data\x1f{op_index}\x1f{t}".encode()
                        ).hexdigest()[:16]
                        return "_:u" + h
                    return t
                out.add((term(s), term(p), term(o), term(ga)))
            return out
        dels = ground(op.delete, False) if op.delete else set()
        adds = ground(op.insert, True) if op.insert else set()
    else:
        dels = (_inst_local(rows, op.delete, op.with_graph,
                            fresh_bnodes=False) if op.delete else set())
        adds = (_inst_local(rows, op.insert, op.with_graph,
                            fresh_bnodes=True) if op.insert else set())
    return (cur - dels) | adds


# ---------------------------------------------------------------------------
# snapshot-versioned store (merge-on-read deltas over SnapshotTable)
# ---------------------------------------------------------------------------


class GraphStore:
    """A SPARQL-updatable quad store on top of :class:`SnapshotTable`.

    Physical rows are (subj, pred, obj, prov, __op, __seq): 'a' rows assert
    a quad, 'd' rows are equality-delete markers (Iceberg v2 shape), __seq
    is a store-global operation sequence so a quad deleted then re-inserted
    resolves correctly. ``read()`` merges with ONE hash aggregation
    (max_by(__op, __seq) per quad); ``compact()`` folds the log into a pure
    add set so steady-state reads pay no delete history. Every ``update``
    call commits only its delta rows — the base data is never rewritten."""

    def __init__(self, spark: SparkSession, root: str):
        from .snapshots import SnapshotTable

        self.spark = spark
        self.tbl = SnapshotTable(root)

    # -- write paths --------------------------------------------------------
    def _next_seq(self) -> int:
        m = self.tbl.manifest() if self.tbl.exists() else None
        return int((m or {}).get("metrics", {}).get("max_seq", -1)) + 1

    def _commit_delta(self, delta: DataFrame, seq_hi: int, stage: str,
                      operation: str = "append",
                      extra: dict | None = None) -> int:
        metrics = {"max_seq": seq_hi, **(extra or {})}
        return self.tbl.commit(delta, operation=operation, stage=stage,
                               metrics=metrics)

    def init(self, quads: DataFrame, stage: str = "graphstore-init") -> int:
        """Seed (or reset) the store from a quad DataFrame."""
        seq = self._next_seq()
        rows = (quads.select(*QUAD_COLS).distinct()
                .withColumn("__op", F.lit("a"))
                .withColumn("__seq", F.lit(seq)))
        return self._commit_delta(rows, seq, stage, operation="overwrite")

    def update(self, text: str) -> int:
        """Apply a SPARQL Update script as ONE atomic snapshot commit of
        its delta rows. Returns the new version."""
        ops = parse_update(text)
        cur = self.read()
        seq0 = self._next_seq()
        parts: list[DataFrame] = []
        for i, op in enumerate(ops):
            cur, dels, adds = _apply_one(cur, op, i)
            # within one op, deletes order before inserts (spec §3.1.3) so
            # a quad both deleted and re-inserted resolves to 'a' at merge
            if dels is not None:
                parts.append(dels.withColumn("__op", F.lit("d"))
                             .withColumn("__seq", F.lit(seq0 + 2 * i)))
            if adds is not None:
                parts.append(adds.withColumn("__op", F.lit("a"))
                             .withColumn("__seq", F.lit(seq0 + 2 * i + 1)))
        if not parts:
            delta = self.spark.createDataFrame(
                [], "subj string, pred string, obj string, prov string, "
                    "__op string, __seq long")
        else:
            delta = reduce(lambda a, b: a.unionByName(b), parts)
        return self._commit_delta(delta, seq0 + 2 * len(ops) - 1,
                                  "sparql-update")

    def append_quads(self, quads: DataFrame, stage: str = "append") -> int:
        """Append a batch of quads as one snapshot of 'a' rows — O(batch),
        no read of the store. Duplicate assertions are harmless: read()'s
        max_by merge is a set union, so a replayed batch (streaming
        foreachBatch retry) changes nothing logically and compact() folds
        the physical duplicates away. The incremental-view path re-derives
        from the replayed rows and its anti-join adds nothing."""
        seq = self._next_seq()
        rows = (quads.select(*QUAD_COLS).distinct()
                .withColumn("__op", F.lit("a"))
                .withColumn("__seq", F.lit(seq)))
        return self._commit_delta(rows, seq, stage)

    def sync(self, release: DataFrame, prefix: str) -> int:
        """Mirror the release's graphs under ``prefix`` into the store (see
        :func:`sync_graphs`), committing only the delta rows. Idempotent:
        a second sync of the same release commits an empty delta."""
        cur = self.read()
        _, dels, adds = sync_graphs(cur, release, prefix)
        seq = self._next_seq()
        delta = (
            dels.withColumn("__op", F.lit("d")).withColumn("__seq", F.lit(seq))
            .unionByName(
                adds.withColumn("__op", F.lit("a"))
                .withColumn("__seq", F.lit(seq + 1)))
        )
        return self._commit_delta(delta, seq + 1, "graph-sync")

    def load(self, path: str, graph: str | None = None) -> int:
        into = f" INTO GRAPH {graph}" if graph else ""
        return self.update(f"LOAD <file://{path}>{into}")

    def entail(self, graph: str = "<urn:nabu:inference>",
               profile: str = "rdfs", incremental: bool = False,
               driver_fast_max: int = 100_000) -> int:
        """Materialize the entailment closure (operators/reasoner.py) of
        the merged store into ``graph``: the inference graph is REPLACED
        with exactly the derived-but-not-asserted triples, committed as
        delta rows (delete markers for stale inferences + adds for new
        ones), so re-entailing after an update is idempotent and never
        rewrites the base. Asserted quads keep their graphs; queries see
        inferred answers through the union default graph, and ``GRAPH
        <urn:nabu:inference>`` isolates them. ``profile`` selects the rule
        set: ``rdfs`` (ρdf core) or ``owl-rl`` (adds inverse/symmetric/
        transitive/functional property rules with sameAs
        canonicalization).

        ``incremental=True`` maintains the inference graph from the delta
        window since the last entail instead of re-closing the store:
        every ρdf rule joins ONE data triple against vocabulary-sized
        schema relations, so for an append-only window that asserts no
        schema triples, closure(T ∪ Δ) = closure(T) ∪ closure(Δ ∪
        schema) — the job reads only the window files plus a
        predicate-pushed schema scan, O(Δ), never a full re-closure. The
        same honesty discipline as matview: any condition that makes the
        shortcut unsound (no prior entail, a non-append window, delete
        markers, schema-touching delta, or the owl-rl profile — whose
        canonical rewrite is non-monotone) falls back to the full
        recompute, and each fallback reason is pinned by a test."""
        from .operators.reasoner import owl_rl_materialize, rdfs_materialize

        if profile not in ("rdfs", "owl-rl"):
            raise ValueError(f"unknown entailment profile {profile!r}")
        if incremental and profile == "rdfs":
            v = self._entail_incremental(graph, driver_fast_max)
            if v is not None:
                return v
        # bounded driver fast path (same economics as the reasoner's own
        # fast paths): a store within ``driver_fast_max`` merged quads closes
        # through the exact in-memory twin and the whole delta (closure,
        # anti-join, old-inference diff) is ONE collect + ONE commit instead
        # of ~6 shuffle-heavy jobs. Semantics are set-for-set the
        # distributed plan below (agreement pinned in tests); pass 0 to
        # force the distributed plan.
        if driver_fast_max:
            quads = self._collect_merged(driver_fast_max)
            if quads is not None:
                return self._entail_local(quads, graph, profile)
        materialize = (rdfs_materialize if profile == "rdfs"
                       else owl_rl_materialize)
        cur = self.read()
        asserted = cur.filter(
            F.col("prov").isNull() | (F.col("prov") != graph))
        base_triples = asserted.select("subj", "pred", "obj").distinct()
        derived = (
            materialize(base_triples)
            .join(base_triples, on=["subj", "pred", "obj"], how="left_anti")
            .withColumn("prov", F.lit(graph))
        )
        old_inf = cur.filter(F.col("prov") == graph)
        dels = _quad_minus(old_inf, derived)
        adds = _quad_minus(derived, old_inf)
        seq = self._next_seq()
        delta = (
            dels.withColumn("__op", F.lit("d")).withColumn("__seq", F.lit(seq))
            .unionByName(adds.withColumn("__op", F.lit("a"))
                         .withColumn("__seq", F.lit(seq + 1)))
        )
        return self._commit_delta(delta, seq + 1, f"{profile}-entail",
                                  extra={"entail_graph": graph})

    def _entail_incremental_local(self, graph: str, wrows: list,
                                  squads: list) -> int:
        """Exact in-memory mirror of the distributed semi-naive tail:
        closure(window ∪ schema) minus asserted = the new inferences; window
        triples retract their inference-graph shadow. Same commit shape and
        metrics as the distributed path (agreement pinned in tests)."""
        from .operators.reasoner import rdfs_closure_local

        window_t = {(r.subj, r.pred, r.obj) for r in wrows}
        asserted = {(s, p, o) for s, p, o, prov in squads
                    if prov is None or prov != graph}
        old_inf = {(s, p, o) for s, p, o, prov in squads if prov == graph}
        schema = {(s, p, o) for s, p, o in asserted
                  if p in self._SCHEMA_PREDS}
        derived = rdfs_closure_local(window_t | schema) - asserted
        adds = sorted(derived - old_inf)
        dels = sorted(old_inf & window_t)
        seq = self._next_seq()
        delta_rows = (
            [(s, p, o, graph, "d", seq) for s, p, o in dels]
            + [(s, p, o, graph, "a", seq + 1) for s, p, o in adds]
        )
        # driver-built and bounded: one output file, not one per slice
        # (repartition, NOT coalesce — coalescing a local relation folds
        # every slice's row-pickling into one task and is ~8x slower)
        delta = self.spark.createDataFrame(
            delta_rows,
            "subj string, pred string, obj string, prov string, "
            "__op string, __seq int").repartition(1)
        return self._commit_delta(
            delta, seq + 1, "rdfs-entail",
            extra={"entail_mode": "incremental", "entail_graph": graph})

    def _collect_merged(self, cap: int) -> list | None:
        """The merged quad-set view collected driver-side WITHOUT read()'s
        groupBy shuffle: raw delta rows stream to the driver and max_by
        merges in a dict (each commit batch is a quad-set and d/a batches
        carry distinct seqs, so the max seq per quad is unique). Returns
        [(subj, pred, obj, prov), ...] or None when the RAW log exceeds
        ``cap`` rows — a stricter bound than the merged size, so the only
        effect of long delete histories is an earlier fall-back to the
        distributed plan."""
        raw = self.tbl.read(self.spark)
        rows = raw.limit(cap + 1).collect()
        if len(rows) > cap:
            return None
        best: dict = {}
        for r in rows:
            q = (r.subj, r.pred, r.obj, r.prov)
            seq = r["__seq"]
            cur = best.get(q)
            if cur is None or seq > cur[0]:
                best[q] = (seq, r["__op"])
        return [q for q, (_, op) in best.items() if op == "a"]

    def _entail_local(self, quads: list, graph: str, profile: str) -> int:
        """Exact in-memory mirror of the distributed entail() tail over the
        collected merged view: asserted = every non-inference quad, closure
        via the reasoner's local twin, delta = (stale inferences as 'd'
        rows, new inferences as 'a' rows)."""
        from .operators.reasoner import owl_closure_local, rdfs_closure_local

        asserted = {(s, p, o) for s, p, o, prov in quads
                    if prov is None or prov != graph}
        old_inf = {(s, p, o) for s, p, o, prov in quads if prov == graph}
        close = rdfs_closure_local if profile == "rdfs" else owl_closure_local
        derived = close(asserted) - asserted
        dels = sorted(old_inf - derived)
        adds = sorted(derived - old_inf)
        seq = self._next_seq()
        delta_rows = (
            [(s, p, o, graph, "d", seq) for s, p, o in dels]
            + [(s, p, o, graph, "a", seq + 1) for s, p, o in adds]
        )
        # driver-built and bounded: one output file, not one per slice
        # (repartition, NOT coalesce — coalescing a local relation folds
        # every slice's row-pickling into one task and is ~8x slower)
        delta = self.spark.createDataFrame(
            delta_rows,
            "subj string, pred string, obj string, prov string, "
            "__op string, __seq int").repartition(1)
        return self._commit_delta(delta, seq + 1, f"{profile}-entail",
                                  extra={"entail_graph": graph})

    _SCHEMA_PREDS = (
        "<http://www.w3.org/2000/01/rdf-schema#subClassOf>",
        "<http://www.w3.org/2000/01/rdf-schema#subPropertyOf>",
        "<http://www.w3.org/2000/01/rdf-schema#domain>",
        "<http://www.w3.org/2000/01/rdf-schema#range>",
    )

    def _entail_incremental(self, graph: str,
                            driver_fast_max: int = 100_000) -> int | None:
        """The semi-naive append path of entail(); None -> caller must
        run the full recompute."""
        from .operators.reasoner import rdfs_materialize

        last = next(
            (h["version"] for h in self.history()
             if h.get("stage") == "rdfs-entail"
             and h.get("metrics", {}).get("entail_graph") == graph),
            None)
        if last is None:
            return None
        head = self.tbl.latest_version()
        if head == last:  # nothing committed since -> no-op delta
            seq = self._next_seq()
            empty = self.spark.createDataFrame(
                [], "subj string, pred string, obj string, prov string"
            ).withColumn("__op", F.lit("a")).withColumn(
                "__seq", F.lit(seq))
            return self._commit_delta(
                empty, seq, "rdfs-entail",
                extra={"entail_mode": "incremental", "entail_graph": graph})
        window = self.raw_window(last, head)
        if window is None:
            return None
        # bounded driver fast path: a window AND store within
        # ``driver_fast_max`` run the identical semi-naive algorithm
        # in-memory — window collect, soundness scan, closure(window ∪
        # schema), store anti-join — as TWO collects + ONE commit instead of
        # checkpoint + probe + materialize + shuffle-join jobs. Falls
        # through to the distributed plan when either side is over-cap;
        # unsound windows return None (full recompute) exactly as below.
        if driver_fast_max:
            wrows = window.limit(driver_fast_max + 1).collect()
            if len(wrows) <= driver_fast_max:
                unsound_local = any(
                    r["__op"] != "a" or r["prov"] == graph
                    or r["pred"] in self._SCHEMA_PREDS
                    for r in wrows)
                if unsound_local:
                    return None
                squads = self._collect_merged(driver_fast_max)
                if squads is not None:
                    return self._entail_incremental_local(
                        graph, wrows, squads)
                # store over cap: fall through to the distributed plan
        window = window.localCheckpoint(eager=True)
        unsound = window.filter(
            (F.col("__op") != "a")
            | (F.col("prov") == graph)
            | F.col("pred").isin(*self._SCHEMA_PREDS)
        ).limit(1).count()
        if unsound:
            return None
        cur = self.read()
        asserted = cur.filter(
            F.col("prov").isNull() | (F.col("prov") != graph))
        # vocabulary-sized by nature; the filter pushes to the scan
        schema = asserted.filter(
            F.col("pred").isin(*self._SCHEMA_PREDS)
        ).select("subj", "pred", "obj").distinct()
        seed = (window.select("subj", "pred", "obj").distinct()
                .unionByName(schema))
        derived = (
            rdfs_materialize(seed)
            .join(asserted.select("subj", "pred", "obj").distinct(),
                  on=["subj", "pred", "obj"], how="left_anti")
            .withColumn("prov", F.lit(graph))
        )
        old_inf = cur.filter(F.col("prov") == graph)
        adds = _quad_minus(derived, old_inf)
        # a triple the window newly ASSERTS may currently live in the
        # inference graph — retract it there so the "exactly
        # derived-but-not-asserted" invariant survives increments
        dels = old_inf.join(
            window.select("subj", "pred", "obj").distinct(),
            on=["subj", "pred", "obj"], how="left_semi")
        seq = self._next_seq()
        delta = (
            dels.withColumn("__op", F.lit("d")).withColumn("__seq", F.lit(seq))
            .unionByName(adds.withColumn("__op", F.lit("a"))
                         .withColumn("__seq", F.lit(seq + 1)))
        )
        return self._commit_delta(
            delta, seq + 1, "rdfs-entail",
            extra={"entail_mode": "incremental", "entail_graph": graph})

    def to_trig(self, prefixes: dict[str, str] | None = None, *,
                max_quads: int = 100_000,
                version: int | None = None) -> str:
        """The merged store (or a past ``version``) as a deterministic
        TriG document: default graph first, one GRAPH block per named
        graph. Driver-side by design — refuses stores above ``max_quads``
        (bulk data belongs in the N-Quads/parquet release paths, TriG is
        for the small artifacts: shapes, VoID, reports, inference)."""
        from .functions.trig import serialize_trig

        rows = (self.read(version).select("subj", "pred", "obj", "prov")
                .limit(max_quads + 1).collect())
        if len(rows) > max_quads:
            raise ValueError(
                f"store exceeds max_quads={max_quads}; export N-Quads/"
                "parquet instead or raise the cap explicitly")
        return serialize_trig(
            ((r.subj, r.pred, r.obj, r.prov) for r in rows), prefixes)

    def compact(self) -> int:
        """Fold the delete log: rewrite the merged view as pure add rows."""
        seq = self._next_seq()
        rows = (self.read().withColumn("__op", F.lit("a"))
                .withColumn("__seq", F.lit(seq)))
        return self._commit_delta(rows, seq, "graphstore-compact",
                                  operation="overwrite")

    # -- read paths ---------------------------------------------------------
    def raw_window(self, v0: int, v1: int) -> DataFrame | None:
        """The physical delta rows committed in versions (v0, v1] —
        (subj, pred, obj, prov, __op, __seq) — or None when the window is
        not purely append-derived (an overwrite — compact, rollback,
        init — replaced the file list, so file-set difference no longer
        equals the logical delta). The incremental-view path feeds on
        this: reading ONLY the window files costs O(delta), never
        O(store)."""
        m0, m1 = self.tbl.manifest(v0), self.tbl.manifest(v1)
        if m0 is None or m1 is None:
            return None
        for v in range(v0 + 1, v1 + 1):
            m = self.tbl.manifest(v)
            if m is None or m["operation"] != "append":
                return None
        base = set(m0["files"])
        new_files = [f for f in m1["files"] if f not in base]
        if not new_files:
            return self.spark.createDataFrame(
                [], "subj string, pred string, obj string, prov string, "
                    "__op string, __seq long")
        return self.spark.read.parquet(*new_files)

    def read(self, version: int | None = None) -> DataFrame:
        """The merged quad-set view at ``version`` (default latest)."""
        raw = self.tbl.read(self.spark, version)
        merged = (
            raw.groupBy(*QUAD_COLS)
            .agg(F.max_by("__op", "__seq").alias("__op"))
        )
        return merged.filter(F.col("__op") == "a").select(*QUAD_COLS)

    def query(self, text: str, version: int | None = None) -> DataFrame:
        from .sparql import sparql_query

        return sparql_query(self.read(version), text, graph_col="prov")

    def history(self) -> list[dict]:
        return self.tbl.history()

    def rollback(self, version: int) -> int:
        return self.tbl.rollback(version)
