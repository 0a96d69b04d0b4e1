"""Motif DSL vs brute-force Python pattern enumeration, plus grammar
validation and GraphFrames-compatible semantics (anonymous vertices,
named edges, negation restrictions, self-loop terms)."""

import pytest

from conftest import graph_from_edges
from linkgraph.operators.patterns import PatternError, find_motifs

EDGES = [
    (1, 2), (2, 3), (1, 3), (3, 1), (2, 4), (4, 2), (4, 5), (5, 5),
]


@pytest.fixture
def pg(spark):
    return graph_from_edges(spark, EDGES)


def test_feed_forward_triangles(pg):
    got = {
        (r["a"], r["b"], r["c"])
        for r in find_motifs(pg, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)").collect()
    }
    es = set(EDGES)
    want = {
        (a, b, c)
        for a, b in es
        for b2, c in es
        if b2 == b and (a, c) in es
    }
    assert got == want
    assert (1, 2, 3) in got


def test_unreciprocated_edges(pg):
    got = {
        (r["a"], r["b"])
        for r in find_motifs(pg, "(a)-[e]->(b); !(b)-[]->(a)").collect()
    }
    es = set(EDGES)
    want = {(a, b) for a, b in es if (b, a) not in es}
    assert got == want


def test_named_edge_columns(pg):
    rows = find_motifs(pg, "(a)-[e]->(b)").collect()
    assert {r["e_src"] for r in rows} == {a for a, _ in EDGES}
    assert all(r["e_src"] == r["a"] and r["e_dst"] == r["b"] for r in rows)
    assert all(abs(r["e_weight"] - 1.0) < 1e-12 for r in rows)
    assert len(rows) == len(set(EDGES))


def test_anonymous_vertices_and_wedge(pg):
    # in-degree-2 wedges: two distinct binding columns, anonymous mid
    got = {
        (r["a"], r["c"])
        for r in find_motifs(pg, "(a)-[]->(b); (c)-[]->(b)").collect()
    }
    es = set(EDGES)
    want = {(a, c) for a, b in es for c, b2 in es if b2 == b}
    assert got == want
    # anonymous target binds nothing but still constrains
    out = find_motifs(pg, "(a)-[]->()")
    assert out.columns == ["a"]
    assert {r["a"] for r in out.collect()} == {a for a, _ in EDGES}


def test_self_loop_term(pg):
    rows = find_motifs(pg, "(a)-[]->(a)").collect()
    assert {r["a"] for r in rows} == {5}


def test_bare_vertex_cross_join(pg):
    rows = find_motifs(pg, "(a)-[]->(b); (z)").collect()
    n_edges = len(set(EDGES))
    n_verts = pg.vertices.count()
    assert len(rows) == n_edges * n_verts


def test_pattern_errors(pg):
    for bad in [
        "",
        "(a)-[]->",
        "!(a)-[e]->(b)",                     # negated edges can't be named
        "(a)-[]->(b); !(b)-[]->(c)",         # c unbound in negation
        "!()-[]->(a)",                        # negated needs named endpoints
        "(a)-[x]->(b); (b)-[x]->(a)",        # duplicate edge name
        "()",                                 # meaningless
        "()-[]->()",                          # binds nothing
        "(a)-[_z]->(b)",                      # reserved name
    ]:
        with pytest.raises(PatternError):
            find_motifs(pg, bad)
