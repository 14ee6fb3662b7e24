"""SPARQL 1.1 Update engine + snapshot graph store.

Every case runs the DataFrame backend and, where the twin supports it
(everything but LOAD), cross-checks `apply_update_local` — two independent
implementations of one documented semantics."""

import os

import pytest
from pyspark.sql import functions as F

from nabu_spark.graphstore import (
    GraphStore,
    SparqlError,
    apply_update,
    apply_update_local,
    parse_update,
)

def _store(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, prov string"
    )


BASE = [
    ("<urn:a>", "<urn:p>", '"1"', None),
    ("<urn:a>", "<urn:q>", "<urn:b>", None),
    ("<urn:b>", "<urn:p>", '"2"', "<urn:g1>"),
    ("<urn:c>", "<urn:p>", '"3"', "<urn:g1>"),
    ("<urn:c>", "<urn:q>", "<urn:a>", "<urn:g2>"),
]


def _key(t):
    return tuple("" if x is None else x for x in t)


def _run(spark, rows, text):
    """Both backends; assert agreement; return the sorted quad list."""
    df = apply_update(_store(spark, rows), text)
    got = sorted((tuple(r) for r in df.collect()), key=_key)
    loc = sorted(apply_update_local(rows, text), key=_key)
    assert got == loc, f"backend divergence:\n df={got}\n local={loc}"
    return got


class TestUpdateData:
    def test_insert_data_default_and_named(self, spark):
        got = _run(spark, BASE, """
            INSERT DATA { <urn:d> <urn:p> "4" .
                          GRAPH <urn:g1> { <urn:d> <urn:p> "5" } }
        """)
        assert ("<urn:d>", "<urn:p>", '"4"', None) in got
        assert ("<urn:d>", "<urn:p>", '"5"', "<urn:g1>") in got
        assert len(got) == len(BASE) + 2

    def test_insert_data_idempotent_set_semantics(self, spark):
        got = _run(spark, BASE, 'INSERT DATA { <urn:a> <urn:p> "1" }')
        assert got == sorted(BASE, key=_key)

    def test_delete_data(self, spark):
        got = _run(spark, BASE, """
            DELETE DATA { <urn:a> <urn:p> "1" .
                          GRAPH <urn:g1> { <urn:b> <urn:p> "2" } }
        """)
        assert ("<urn:a>", "<urn:p>", '"1"', None) not in got
        assert ("<urn:b>", "<urn:p>", '"2"', "<urn:g1>") not in got
        assert len(got) == len(BASE) - 2

    def test_delete_data_absent_quad_is_noop(self, spark):
        got = _run(spark, BASE, 'DELETE DATA { <urn:zz> <urn:p> "9" }')
        assert got == sorted(BASE, key=_key)

    def test_insert_data_bnode_fresh_and_deterministic(self, spark):
        upd = "INSERT DATA { _:x <urn:p> _:x . _:x <urn:q> _:y }"
        got = _run(spark, [], upd)
        subs = {s for s, p, o, g in got}
        # _:x is one fresh node shared across the op; _:y another
        assert len(got) == 2 and len(subs) == 1
        assert all(s.startswith("_:u") for s in subs)
        # deterministic across runs
        assert got == _run(spark, [], upd)

    def test_delete_data_rejects_bnodes_and_vars(self, spark):
        with pytest.raises(SparqlError):
            parse_update("DELETE DATA { _:b <urn:p> <urn:o> }")
        with pytest.raises(SparqlError):
            parse_update("DELETE DATA { ?s <urn:p> <urn:o> }")
        with pytest.raises(SparqlError):
            parse_update("INSERT DATA { ?s <urn:p> <urn:o> }")


class TestModify:
    def test_delete_insert_where(self, spark):
        got = _run(spark, BASE, """
            DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p2> ?o }
            WHERE { ?s <urn:p> ?o }
        """)
        # bare templates scope to the DEFAULT graph: the default-graph
        # <urn:p> quad is rewritten, named-graph ones stay where they are —
        # but the WHERE matched all graphs, so every subject gains a
        # default-graph <urn:p2> quad
        assert ("<urn:a>", "<urn:p>", '"1"', None) not in got
        assert ("<urn:b>", "<urn:p>", '"2"', "<urn:g1>") in got
        assert ("<urn:a>", "<urn:p2>", '"1"', None) in got
        assert ("<urn:b>", "<urn:p2>", '"2"', None) in got

    def test_with_scopes_where_and_templates(self, spark):
        got = _run(spark, BASE, """
            WITH <urn:g1> DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p2> ?o }
            WHERE { ?s <urn:p> ?o }
        """)
        # default-graph <urn:a> untouched; g1 rows rewritten inside g1
        assert ("<urn:a>", "<urn:p>", '"1"', None) in got
        assert ("<urn:b>", "<urn:p2>", '"2"', "<urn:g1>") in got
        assert ("<urn:c>", "<urn:p2>", '"3"', "<urn:g1>") in got
        assert not any(p == "<urn:p>" and g == "<urn:g1>"
                       for _, p, _, g in got)

    def test_delete_where_shorthand_with_graph_var(self, spark):
        got = _run(spark, BASE, "DELETE WHERE { GRAPH ?g { ?s <urn:p> ?o } }")
        assert ("<urn:a>", "<urn:p>", '"1"', None) in got  # default kept
        assert not any(g is not None and p == "<urn:p>"
                       for _, p, _, g in got)

    def test_insert_where_with_filter_and_graph_template(self, spark):
        got = _run(spark, BASE, """
            INSERT { GRAPH <urn:out> { ?s <urn:flag> "hit" } }
            WHERE { ?s <urn:p> ?o . FILTER(?o != "1") }
        """)
        flagged = {s for s, p, o, g in got if g == "<urn:out>"}
        assert flagged == {"<urn:b>", "<urn:c>"}

    def test_unbound_template_var_skips_quad(self, spark):
        got = _run(spark, BASE, """
            INSERT { ?s <urn:v> ?v . ?s <urn:seen> "y" }
            WHERE { ?s <urn:p> ?o . OPTIONAL { ?s <urn:q> ?v } }
        """)
        # ?v binds for <urn:a> and (via the g2 quad — WHERE is
        # union-default-graph) <urn:c>; the ?v quad is skipped for
        # <urn:b>, whose ?s-only quad still instantiates
        assert ("<urn:a>", "<urn:v>", "<urn:b>", None) in got
        assert ("<urn:c>", "<urn:v>", "<urn:a>", None) in got
        assert not any(p == "<urn:v>" and s == "<urn:b>"
                       for s, p, _, _ in got)
        assert sum(1 for _, p, _, _ in got if p == "<urn:seen>") == 3

    def test_literal_in_subject_position_skipped(self, spark):
        got = _run(spark, BASE, """
            INSERT { ?o <urn:rev> ?s } WHERE { ?s <urn:p> ?o }
        """)
        # all <urn:p> objects are literals -> every instantiation skipped
        assert got == sorted(BASE, key=_key)

    def test_insert_bnode_fresh_per_solution(self, spark):
        got = _run(spark, BASE, """
            INSERT { ?s <urn:addr> _:b . _:b <urn:of> ?s }
            WHERE { ?s <urn:p> ?o }
        """)
        bnodes = {o for _, p, o, _ in got if p == "<urn:addr>"}
        # three distinct subjects -> three fresh bnodes, each linked back
        assert len(bnodes) == 3
        for b in bnodes:
            assert any(s == b and p == "<urn:of>" for s, p, _, _ in got)

    def test_delete_insert_same_quad_survives(self, spark):
        got = _run(spark, BASE, """
            DELETE { ?s ?p ?o } INSERT { ?s ?p ?o } WHERE { ?s ?p ?o }
        """)
        # named-graph rows collapse into default (bare template), default
        # rows survive verbatim
        assert ("<urn:a>", "<urn:p>", '"1"', None) in got

    def test_sequence_sees_prior_op(self, spark):
        got = _run(spark, [], """
            INSERT DATA { <urn:x> <urn:p> "1" } ;
            DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p> "2" }
            WHERE { ?s <urn:p> ?o } ;
            INSERT { ?s <urn:p3> ?o } WHERE { ?s <urn:p> ?o }
        """)
        assert got == sorted(
            [("<urn:x>", "<urn:p>", '"2"', None),
             ("<urn:x>", "<urn:p3>", '"2"', None)], key=_key)

    def test_paths_rejected_in_templates_but_fine_in_where(self, spark):
        with pytest.raises(SparqlError):
            parse_update("DELETE { ?s <urn:p>+ ?o } WHERE { ?s <urn:p> ?o }")
        got = _run(spark, BASE, """
            INSERT { ?s <urn:reach> ?o } WHERE { ?s <urn:q>+ ?o }
        """)
        assert ("<urn:c>", "<urn:reach>", "<urn:b>", None) in got  # c-q-a-q-b


class TestUsing:
    """USING/USING NAMED (§3.1.3): the WHERE evaluates against the USING
    dataset exactly as a query's FROM would; WITH is then ignored for the
    WHERE but still routes templates."""

    def test_using_scopes_where_to_graph(self, spark):
        got = _run(spark, BASE, """
            INSERT { GRAPH <urn:out> { ?s <urn:p> ?o } }
            USING <urn:g1> WHERE { ?s <urn:p> ?o }
        """)
        added = [q for q in got if q[3] == "<urn:out>"]
        # default-graph <urn:a> "1" is OUTSIDE the USING dataset
        assert added == [("<urn:b>", "<urn:p>", '"2"', "<urn:out>"),
                         ("<urn:c>", "<urn:p>", '"3"', "<urn:out>")]

    def test_using_named_empties_default_graph(self, spark):
        got = _run(spark, BASE, """
            INSERT { GRAPH <urn:out> { ?s ?p ?o } }
            USING NAMED <urn:g2> WHERE { ?s ?p ?o }
        """)
        assert got == sorted(BASE, key=_key)  # bare pattern saw nothing

    def test_using_named_scopes_graph_var(self, spark):
        got = _run(spark, BASE, """
            INSERT { GRAPH <urn:out> { ?s ?p ?o } }
            USING NAMED <urn:g2> WHERE { GRAPH ?g { ?s ?p ?o } }
        """)
        added = [q for q in got if q[3] == "<urn:out>"]
        assert added == [("<urn:c>", "<urn:q>", "<urn:a>", "<urn:out>")]

    def test_with_ignored_for_where_under_using(self, spark):
        got = _run(spark, BASE, """
            WITH <urn:dst> INSERT { ?s <urn:r> ?o }
            USING <urn:g2> WHERE { ?s <urn:q> ?o }
        """)
        # WHERE ranged over g2 (not the empty <urn:dst> WITH would give);
        # the GRAPH-less template still lands in the WITH graph
        assert ("<urn:c>", "<urn:r>", "<urn:a>", "<urn:dst>") in got

    def test_delete_using(self, spark):
        got = _run(spark, BASE, """
            DELETE { GRAPH <urn:g1> { ?s <urn:p> ?o } }
            USING <urn:g1> WHERE { ?s <urn:p> ?o . FILTER(?s = <urn:b>) }
        """)
        assert ("<urn:b>", "<urn:p>", '"2"', "<urn:g1>") not in got
        assert len(got) == len(BASE) - 1


class TestGraphMgmt:
    def test_clear_forms(self, spark):
        assert all(g == "<urn:g2>" or g is None for _, _, _, g in
                   _run(spark, BASE, "CLEAR GRAPH <urn:g1>"))
        assert all(g is not None for _, _, _, g in
                   _run(spark, BASE, "CLEAR DEFAULT"))
        assert all(g is None for _, _, _, g in
                   _run(spark, BASE, "CLEAR NAMED"))
        assert _run(spark, BASE, "DROP ALL") == []

    def test_create_is_noop(self, spark):
        assert _run(spark, BASE, "CREATE GRAPH <urn:new>") == sorted(BASE, key=_key)

    def test_copy_overwrites_destination(self, spark):
        got = _run(spark, BASE, "COPY GRAPH <urn:g1> TO DEFAULT")
        default = {(s, p, o) for s, p, o, g in got if g is None}
        assert default == {("<urn:b>", "<urn:p>", '"2"'),
                           ("<urn:c>", "<urn:p>", '"3"')}
        # source untouched
        assert ("<urn:b>", "<urn:p>", '"2"', "<urn:g1>") in got

    def test_move_removes_source(self, spark):
        got = _run(spark, BASE, "MOVE DEFAULT TO GRAPH <urn:g2>")
        assert not any(g is None for _, _, _, g in got)
        g2 = {(s, p, o) for s, p, o, g in got if g == "<urn:g2>"}
        assert g2 == {("<urn:a>", "<urn:p>", '"1"'),
                      ("<urn:a>", "<urn:q>", "<urn:b>")}

    def test_add_merges_without_clearing(self, spark):
        got = _run(spark, BASE, "ADD GRAPH <urn:g1> TO GRAPH <urn:g2>")
        g2 = {(s, p, o) for s, p, o, g in got if g == "<urn:g2>"}
        assert ("<urn:c>", "<urn:q>", "<urn:a>") in g2  # pre-existing kept
        assert ("<urn:b>", "<urn:p>", '"2"') in g2

    def test_self_copy_is_noop(self, spark):
        assert _run(spark, BASE, "COPY DEFAULT TO DEFAULT") == sorted(BASE, key=_key)
        assert (_run(spark, BASE, "MOVE GRAPH <urn:g1> TO GRAPH <urn:g1>")
                == sorted(BASE, key=_key))


class TestParser:
    def test_using_parses_before_where_only(self):
        # grammar: templates, then UsingClause*, then WHERE — a leading
        # USING is not an operation
        with pytest.raises(SparqlError):
            parse_update("USING <urn:g> DELETE { ?s ?p ?o } "
                         "WHERE { ?s ?p ?o }")
        ops = parse_update(
            "DELETE { ?s ?p ?o } USING <urn:g1> USING NAMED <urn:g2> "
            "WHERE { ?s ?p ?o }")
        assert ops[0].using == (["<urn:g1>"], ["<urn:g2>"])

    def test_prefixes_and_semicolons(self):
        ops = parse_update("""
            PREFIX u: <urn:>
            INSERT DATA { u:a u:p "1" } ;
            PREFIX v: <urn:v/>
            DELETE DATA { v:b u:p "2" } ;
        """)
        assert len(ops) == 2
        assert ops[1].delete[0][1] == ("term", "<urn:v/b>")

    def test_empty_update_rejected(self):
        with pytest.raises(SparqlError):
            parse_update("   ")

    def test_literal_graph_label_rejected(self):
        with pytest.raises(SparqlError):
            parse_update('INSERT DATA { GRAPH "g" { <urn:a> <urn:p> "1" } }')


class TestGraphStore:
    def test_update_commit_time_travel_rollback(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "store"))
        v0 = gs.init(_store(spark, BASE))
        v1 = gs.update('INSERT DATA { <urn:new> <urn:p> "9" }')
        v2 = gs.update("CLEAR GRAPH <urn:g1>")
        assert v0 < v1 < v2
        assert gs.read(v0).count() == len(BASE)
        assert gs.read(v1).count() == len(BASE) + 1
        now = sorted(tuple(r) for r in gs.read().collect())
        assert not any(g == "<urn:g1>" for _, _, _, g in now)
        # equality with the batch engine applied to the same script
        batch = apply_update_local(
            BASE, 'INSERT DATA { <urn:new> <urn:p> "9" } ; '
                  "CLEAR GRAPH <urn:g1>")
        assert now == sorted(batch)
        # rollback then re-read
        gs.rollback(v1)
        assert gs.read().count() == len(BASE) + 1

    def test_delete_then_reinsert_within_one_script(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "s2"))
        gs.init(_store(spark, BASE))
        gs.update("""
            DELETE DATA { <urn:a> <urn:p> "1" } ;
            INSERT DATA { <urn:a> <urn:p> "1" }
        """)
        assert ("<urn:a>", "<urn:p>", '"1"', None) in {
            tuple(r) for r in gs.read().collect()}

    def test_compact_preserves_view_and_folds_log(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "s3"))
        gs.init(_store(spark, BASE))
        gs.update('DELETE DATA { <urn:a> <urn:p> "1" }')
        before = sorted(tuple(r) for r in gs.read().collect())
        v = gs.compact()
        assert sorted(tuple(r) for r in gs.read().collect()) == before
        raw = gs.tbl.read(spark, v)
        assert raw.filter(F.col("__op") == "d").count() == 0

    def test_deltas_only_commits(self, spark, tmp_path):
        """A small update against a big-ish base commits ONLY delta rows —
        the 100-TB property: the base is never rewritten."""
        gs = GraphStore(spark, str(tmp_path / "s4"))
        rows = [(f"<urn:s{i}>", "<urn:p>", f'"{i}"', None)
                for i in range(500)]
        gs.init(_store(spark, rows))
        v = gs.update('DELETE DATA { <urn:s0> <urn:p> "0" } ; '
                      'INSERT DATA { <urn:x> <urn:p> "x" }')
        m = gs.tbl.manifest(v)
        assert m["operation"] == "append"
        assert m["row_count"] == 2  # one delete marker + one add
        assert gs.read().count() == 500

    def test_load_nquads_into_graph(self, spark, tmp_path):
        nq = tmp_path / "data.nq"
        nq.write_text('<urn:l1> <urn:p> "v" .\n'
                      '<urn:l2> <urn:p> "w" <urn:orig> .\n'
                      "malformed line\n")
        gs = GraphStore(spark, str(tmp_path / "s5"))
        gs.init(_store(spark, []))
        gs.load(str(nq), graph="<urn:dst>")
        got = {tuple(r) for r in gs.read().collect()}
        # INTO GRAPH overrides the file's own labels; malformed dropped
        assert got == {("<urn:l1>", "<urn:p>", '"v"', "<urn:dst>"),
                       ("<urn:l2>", "<urn:p>", '"w"', "<urn:dst>")}
        # without INTO, the file's labels survive
        gs.update(f"LOAD <file://{nq}>")
        got2 = {tuple(r) for r in gs.read().collect()}
        assert ("<urn:l2>", "<urn:p>", '"w"', "<urn:orig>") in got2

    def test_load_silent_missing_file(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "s6"))
        gs.init(_store(spark, BASE))
        gs.update("LOAD SILENT <file:///nonexistent/x.nq>")
        assert gs.read().count() == len(BASE)
        with pytest.raises(Exception):
            gs.update("LOAD <file:///nonexistent/x.nq>")

    def test_query_over_store(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "s7"))
        gs.init(_store(spark, BASE))
        rows = gs.query(
            "SELECT ?s WHERE { GRAPH <urn:g1> { ?s <urn:p> ?o } }"
        ).collect()
        assert sorted(r["s"] for r in rows) == ["<urn:b>", "<urn:c>"]


class TestGraphSync:
    """Object-store -> triplestore sync semantics (the reference's core
    synchronizer loop) as two anti-joins over the store."""

    STORE = [
        ("<urn:a>", "<urn:p>", '"keep"', "<urn:iow:d:1>"),   # unchanged
        ("<urn:a>", "<urn:p>", '"old"', "<urn:iow:d:1>"),    # changed away
        ("<urn:b>", "<urn:p>", '"orphan"', "<urn:iow:d:2>"),  # orphan graph
        ("<urn:x>", "<urn:p>", '"other"', "<urn:other:9>"),  # out of scope
        ("<urn:y>", "<urn:p>", '"default"', None),           # default graph
    ]
    RELEASE = [
        ("<urn:a>", "<urn:p>", '"keep"', "<urn:iow:d:1>"),
        ("<urn:a>", "<urn:p>", '"new"', "<urn:iow:d:1>"),
        ("<urn:c>", "<urn:p>", '"fresh"', "<urn:iow:d:3>"),  # new graph
        ("<urn:z>", "<urn:p>", '"noise"', "<urn:other:8>"),  # ignored
    ]

    def test_sync_graphs_diff(self, spark):
        from nabu_spark.graphstore import sync_graphs

        new, dels, adds = sync_graphs(
            _store(spark, self.STORE), _store(spark, self.RELEASE),
            "urn:iow:")
        got = sorted((tuple(r) for r in new.collect()), key=_key)
        want = sorted([
            self.STORE[0], self.STORE[3], self.STORE[4],
            self.RELEASE[1], self.RELEASE[2],
        ], key=_key)
        assert got == want
        assert sorted(tuple(r) for r in dels.collect()) == sorted(
            [self.STORE[1], self.STORE[2]])
        assert sorted(tuple(r) for r in adds.collect()) == sorted(
            [self.RELEASE[1], self.RELEASE[2]])

    def test_store_sync_idempotent_delta_commits(self, spark, tmp_path):
        gs = GraphStore(spark, str(tmp_path / "sync"))
        gs.init(_store(spark, self.STORE))
        rel = _store(spark, self.RELEASE)
        v1 = gs.sync(rel, "urn:iow:")
        m1 = gs.tbl.manifest(v1)
        assert m1["operation"] == "append"
        assert m1["row_count"] == 4  # 2 delete markers + 2 adds
        got = sorted((tuple(r) for r in gs.read().collect()), key=_key)
        assert ("<urn:b>", "<urn:p>", '"orphan"', "<urn:iow:d:2>") not in got
        assert ("<urn:c>", "<urn:p>", '"fresh"', "<urn:iow:d:3>") in got
        assert ("<urn:x>", "<urn:p>", '"other"', "<urn:other:9>") in got
        # second sync of the same release: empty delta, view unchanged
        v2 = gs.sync(rel, "urn:iow:")
        assert gs.tbl.manifest(v2)["row_count"] == 0
        assert sorted((tuple(r) for r in gs.read().collect()),
                      key=_key) == got


class TestUpdateFuzz:
    """Seeded random update scripts over random stores: the DataFrame
    compiler and the in-memory twin must agree on every final state."""

    def test_random_scripts_agree(self, spark):
        import random

        rng = random.Random(20260817)
        subs = [f"<urn:s{i}>" for i in range(6)]
        preds = [f"<urn:p{i}>" for i in range(3)]
        objs = ['"a"', '"b"', "<urn:o1>", '"c"@en']
        graphs = [None, "<urn:g1>", "<urn:g2>"]

        def rand_store(n):
            return list({(rng.choice(subs), rng.choice(preds),
                          rng.choice(objs), rng.choice(graphs))
                         for _ in range(n)})

        def rand_ground_quad():
            g = rng.choice(graphs)
            q = f"{rng.choice(subs)} {rng.choice(preds)} {rng.choice(objs)}"
            return f"GRAPH {g} {{ {q} }}" if g else q

        def rand_op():
            kind = rng.randrange(6)
            if kind == 0:
                return ("INSERT DATA { "
                        + " . ".join(rand_ground_quad()
                                     for _ in range(rng.randrange(1, 3)))
                        + " }")
            if kind == 1:
                return ("DELETE DATA { "
                        + " . ".join(rand_ground_quad()
                                     for _ in range(rng.randrange(1, 3)))
                        + " }")
            if kind == 2:
                ref = rng.choice(["DEFAULT", "NAMED", "GRAPH <urn:g1>",
                                  "GRAPH <urn:g2>"])
                return f"CLEAR {ref}"
            if kind == 3:
                a, b = rng.sample(["DEFAULT", "GRAPH <urn:g1>",
                                   "GRAPH <urn:g2>"], 2)
                return f"{rng.choice(['COPY', 'MOVE', 'ADD'])} {a} TO {b}"
            if kind == 4:
                p, p2 = rng.sample(preds, 2)
                return (f"DELETE {{ ?s {p} ?o }} INSERT {{ ?s {p2} ?o }} "
                        f"WHERE {{ ?s {p} ?o }}")
            p = rng.choice(preds)
            o = rng.choice(objs)
            return (f"INSERT {{ ?s <urn:hit> {o} }} "
                    f"WHERE {{ GRAPH ?g {{ ?s {p} ?o2 }} }}")

        for trial in range(8):
            rows = rand_store(rng.randrange(3, 10))
            script = " ; ".join(rand_op()
                                for _ in range(rng.randrange(1, 4)))
            got = sorted(
                (tuple(r) for r in
                 apply_update(_store(spark, rows), script).collect()),
                key=_key)
            loc = sorted(apply_update_local(rows, script), key=_key)
            assert got == loc, (
                f"trial {trial} diverged\nscript: {script}\n"
                f"store: {rows}\n df={got}\n local={loc}")


class TestRollbackSequencing:
    def test_update_after_rollback_still_wins_merge(self, spark, tmp_path):
        """Review fix: rollback must carry max_seq forward — a delete
        committed after a rollback has to out-sequence the restored rows
        or the max_by merge silently ignores it."""
        st = GraphStore(spark, str(tmp_path / "store"))
        st.init(_store(spark, BASE))
        st.update('INSERT DATA { <urn:z> <urn:p> "9" }')
        v_before = st.tbl.latest_version()
        st.update('INSERT DATA { <urn:z2> <urn:p> "10" }')
        st.rollback(v_before)
        st.update('DELETE DATA { <urn:a> <urn:p> "1" }')
        rows = {tuple(r) for r in st.read().collect()}
        assert ("<urn:a>", "<urn:p>", '"1"', None) not in rows
        assert ("<urn:z>", "<urn:p>", '"9"', None) in rows
        assert not any(s == "<urn:z2>" for s, _, _, _ in rows)
