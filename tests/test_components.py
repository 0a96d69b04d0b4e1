import networkx as nx
import pytest

from conftest import collect_map, graph_from_edges
from linkgraph.graph import LinkGraph
from linkgraph.operators.components import (
    strongly_connected_components,
    weakly_connected_components,
)
from pyspark.sql import functions as F


def _partition(mapping):
    groups = {}
    for k, v in mapping.items():
        groups.setdefault(v, set()).add(k)
    return {frozenset(g) for g in groups.values()}


def test_wcc_two_components(two_components):
    got = collect_map(weakly_connected_components(two_components).state, "id", "component")
    assert _partition(got) == {frozenset({1, 2}), frozenset({3, 4})}
    # canonical label = min member id
    assert got[1] == 1 and got[2] == 1 and got[3] == 3


def test_wcc_directed_weak(scc_mixed):
    got = collect_map(weakly_connected_components(scc_mixed).state, "id", "component")
    assert _partition(got) == {frozenset({1, 2, 3, 4})}


def test_scc_triangle_plus_tail(scc_mixed):
    got = collect_map(strongly_connected_components(scc_mixed), "id", "component")
    assert _partition(got) == {frozenset({1, 2, 3}), frozenset({4})}
    assert got[1] == 1 and got[4] == 4


def test_components_random_vs_networkx(spark):
    import numpy as np

    rng = np.random.RandomState(83810)
    edges = {(int(rng.randint(0, 80)), int(rng.randint(0, 80))) for _ in range(150)}
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, vertices=range(80))

    G = nx.DiGraph()
    G.add_nodes_from(range(80))
    G.add_edges_from(edges)

    wcc = _partition(collect_map(weakly_connected_components(g).state, "id", "component"))
    assert wcc == {frozenset(c) for c in nx.weakly_connected_components(G)}

    scc = _partition(collect_map(strongly_connected_components(g), "id", "component"))
    assert scc == {frozenset(c) for c in nx.strongly_connected_components(G)}


def test_wcc_chain_deep(spark):
    # path graph: worst-case diameter for label propagation
    g = graph_from_edges(spark, [(i, i + 1) for i in range(12)], directed=False)
    got = collect_map(weakly_connected_components(g, max_iter=30).state, "id", "component")
    assert set(got.values()) == {0}


def test_scc_no_duplicate_rows_with_multi_color_predecessors(spark):
    """Regression: marked predecessors of SEVERAL colors used to fan a
    vertex's state row out into duplicates (181 rows on a 150-vertex
    graph). Exactly one row per vertex, always."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 3), (2, 3), (3, 4), (4, 3)])
    rows = strongly_connected_components(g).collect()
    assert len(rows) == 4
    comp = {r["id"]: r["component"] for r in rows}
    assert comp[3] == comp[4]
    assert comp[1] != comp[2]


def test_wcc_pointer_jumping_logarithmic_rounds(spark):
    """A 120-vertex path needs ~120 plain label rounds but O(log)
    with pointer jumping; labels (min id per component) identical."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(i, i + 1) for i in range(120)], directed=False)
    res = weakly_connected_components(g, max_iter=20, jump=True)
    assert res.iterations <= 20
    labels = {r["id"]: r["component"] for r in res.state.collect()}
    assert set(labels.values()) == {0}
    # the plain step cannot finish a 120-path in 20 rounds
    import pytest as _pytest

    from linkgraph.plans.iterate import ConvergenceError

    with _pytest.raises(ConvergenceError):
        weakly_connected_components(g, max_iter=20, jump=False)


def test_bowtie_decomposition_vs_networkx(spark):
    """Classic bow-tie (IN → CORE cycle → OUT, a tendril, a tube, a
    disconnected pair) plus random digraphs vs a NetworkX-derived
    oracle (largest SCC, descendants/ancestors, weak components)."""
    import random

    import networkx as nx

    from conftest import graph_from_edges
    from linkgraph.operators.bowtie import bowtie_decomposition

    def oracle(edges):
        G = nx.DiGraph(edges)
        sccs = sorted(
            nx.strongly_connected_components(G), key=lambda c: (-len(c), min(c))
        )
        core = sccs[0]
        fwd = set().union(*[nx.descendants(G, v) for v in core]) | core
        bwd = set().union(*[nx.ancestors(G, v) for v in core]) | core
        weak = next(c for c in nx.weakly_connected_components(G) if core & c)
        return {
            v: "CORE" if v in core
            else "IN" if v in bwd
            else "OUT" if v in fwd
            else "TENDRIL" if v in weak
            else "DISCONNECTED"
            for v in G
        }

    hand = [(1, 3), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6), (6, 7),
            (1, 8), (1, 9), (9, 6), (10, 11)]
    cases = [hand]
    for seed in (5, 23):
        rng = random.Random(seed)
        cases.append(sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(55)}))
    for edges in cases:
        g = graph_from_edges(spark, edges, directed=True)
        got = {r["id"]: r["region"] for r in bowtie_decomposition(g).collect()}
        assert got == oracle(edges)


def test_bowtie_requires_directed(spark):
    import pytest

    from conftest import graph_from_edges
    from linkgraph.operators.bowtie import bowtie_decomposition

    with pytest.raises(ValueError):
        bowtie_decomposition(graph_from_edges(spark, [(1, 2)], directed=False))


def test_wcc_warm_start_additions_only(spark):
    import networkx as nx

    from conftest import graph_from_edges
    from linkgraph.operators.components import weakly_connected_components

    G = nx.gnp_random_graph(60, 0.03, seed=11, directed=True)
    base_edges = list(G.edges())
    g0 = graph_from_edges(spark, base_edges, directed=True, vertices=list(G))
    cold0 = weakly_connected_components(g0)

    # additions-only crawl delta: bridges that merge components + a
    # brand-new vertex
    delta = [(0, 30), (15, 45), (59, 100)]
    g1 = graph_from_edges(
        spark, base_edges + delta, directed=True, vertices=list(G) + [100]
    )
    cold1 = weakly_connected_components(g1)
    warm1 = weakly_connected_components(g1, init_labels=cold0.state)

    c = {r.id: r.component for r in cold1.state.collect()}
    w = {r.id: r.component for r in warm1.state.collect()}
    assert c == w
    # labels are the canonical min vertex id per component
    H = nx.Graph()
    H.add_nodes_from(G)
    H.add_node(100)
    H.add_edges_from(base_edges + delta)
    for comp in nx.connected_components(H):
        m = min(comp)
        for v in comp:
            assert c[v] == m
    # warm start converges in no more rounds than cold (usually fewer)
    assert warm1.iterations <= cold1.iterations


# --- alternating large-star / small-star WCC (Kiveris et al. 2014) ----------


def test_alternating_cc_two_components(two_components):
    from linkgraph.operators.components import connected_components_alternating

    got = collect_map(
        connected_components_alternating(two_components).state, "id", "component"
    )
    assert _partition(got) == {frozenset({1, 2}), frozenset({3, 4})}
    assert got[1] == 1 and got[2] == 1 and got[3] == 3


def test_alternating_cc_random_vs_networkx(spark):
    import numpy as np

    from linkgraph.operators.components import connected_components_alternating

    rng = np.random.RandomState(4242)
    edges = {(int(rng.randint(0, 120)), int(rng.randint(0, 120))) for _ in range(200)}
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, vertices=range(120))
    G = nx.DiGraph()
    G.add_nodes_from(range(120))
    G.add_edges_from(edges)
    got = collect_map(
        connected_components_alternating(g).state, "id", "component"
    )
    want = {}
    for c in nx.weakly_connected_components(G):
        m = min(c)
        for v in c:
            want[v] = m
    assert got == want  # labels exactly min-id, isolated vertices included


def test_alternating_cc_deep_chain_logsq_rounds(spark):
    """A 300-vertex path needs ~300 min-label rounds but converges in
    O(log^2 n) star-contraction rounds (measured: 10)."""
    from linkgraph.operators.components import connected_components_alternating

    g = graph_from_edges(spark, [(i, i + 1) for i in range(300)], directed=False)
    res = connected_components_alternating(g, max_iter=16)
    assert res.iterations <= 16
    labels = collect_map(res.state, "id", "component")
    assert set(labels.values()) == {0}
    assert len(labels) == 301


def test_alternating_cc_resume_after_kill(spark, tmp_path):
    from linkgraph.operators.components import connected_components_alternating
    from linkgraph.plans.iterate import ConvergenceError

    g = graph_from_edges(spark, [(i, i + 1) for i in range(120)], directed=False)
    want = collect_map(
        connected_components_alternating(g).state, "id", "component"
    )
    d = str(tmp_path / "altcc")
    with pytest.raises(ConvergenceError):
        connected_components_alternating(
            g, max_iter=3, checkpoint_dir=d, checkpoint_every=1
        )
    res = connected_components_alternating(
        g, checkpoint_dir=d, checkpoint_every=1
    )
    assert res.stats[0].resumed  # continued from the durable edge frame
    assert collect_map(res.state, "id", "component") == want


def test_wcc_auto_escalates_on_deep_chain(spark):
    """The default jump="auto" escape hatch: a 20k-diameter chain
    from a COLD start converges in jump_after + O(log d) rounds (the
    plain step would need 20k) and the labels are the exact
    component minima; a shallow graph never escalates (iterations
    stay under jump_after)."""
    from conftest import graph_from_edges

    n = 20_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    g = LinkGraph(edges, directed=False)
    res = weakly_connected_components(g, max_iter=80)
    # 16 plain rounds + ~log2(20k) jump rounds + slack
    assert res.iterations <= 50, res.iterations
    assert res.state.filter(F.col("component") != 0).count() == 0
    assert res.state.count() == n
    # shallow graph: converges before the escape would trigger
    shallow = graph_from_edges(
        spark, [(0, i) for i in range(1, 40)], directed=False
    )
    res2 = weakly_connected_components(shallow)
    assert res2.iterations <= 4
