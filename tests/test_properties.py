"""Property-based invariants over hypothesis-generated random graphs
(SURVEY §5.2 item 3). One Spark-backed check per algorithm family,
small graph sizes (each example is a full Spark job), deadline off.

Invariants, not golden values: rank mass conservation, component
label canonicality vs NetworkX, triangle count symmetry, MSF weight
optimality vs NetworkX — the properties that stay true at any scale.
"""

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import graph_from_edges
from linkgraph.operators.components import weakly_connected_components
from linkgraph.operators.mst import minimum_spanning_forest
from linkgraph.operators.pagerank import pagerank
from linkgraph.operators.triangles import triangle_counts

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def edge_lists(draw, max_nodes=12, max_edges=24):
    n = draw(st.integers(min_value=2, max_value=max_nodes))
    m = draw(st.integers(min_value=1, max_value=max_edges))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=m,
            unique=True,
        )
    )
    return edges


@pytest.mark.slow
@given(edges=edge_lists())
@settings(**SETTINGS)
def test_pagerank_mass_conserved(spark, edges):
    g = graph_from_edges(spark, edges, directed=True)
    res = pagerank(g, tol=1e-8, max_iter=200).state
    total = res.agg({"rank": "sum"}).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


@pytest.mark.slow
@given(edges=edge_lists())
@settings(**SETTINGS)
def test_wcc_matches_networkx_partition(spark, edges):
    g = graph_from_edges(spark, edges, directed=False)
    got = {}
    for r in weakly_connected_components(g).state.collect():
        got.setdefault(r["component"], set()).add(r["id"])
    G = nx.Graph()
    G.add_edges_from(edges)
    expect = {frozenset(c) for c in nx.connected_components(G)}
    assert {frozenset(v) for v in got.values()} == expect
    # canonical label = min id in component
    for label, members in got.items():
        assert label == min(members)


@pytest.mark.slow
@given(edges=edge_lists())
@settings(**SETTINGS)
def test_triangles_match_networkx(spark, edges):
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["triangles"] for r in triangle_counts(g).collect()}
    G = nx.Graph()
    G.add_edges_from(edges)
    expect = nx.triangles(G)
    for v, t in expect.items():
        assert got.get(v, 0) == t


@pytest.mark.slow
@given(edges=edge_lists(), data=st.data())
@settings(**SETTINGS)
def test_msf_total_weight_optimal(spark, edges, data):
    weights = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=50),
            min_size=len(edges),
            max_size=len(edges),
        )
    )
    wedges = [(a, b, float(w)) for (a, b), w in zip(edges, weights)]
    g = graph_from_edges(spark, wedges, directed=False)
    ours = sum(r["weight"] for r in minimum_spanning_forest(g).collect())
    G = nx.Graph()
    for a, b, w in wedges:
        # parallel undirected duplicates keep min weight, like the engine
        if G.has_edge(a, b):
            w = min(w, G[a][b]["weight"])
        G.add_edge(a, b, weight=w)
    expect = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(G, data=True)
    )
    assert ours == pytest.approx(expect)
