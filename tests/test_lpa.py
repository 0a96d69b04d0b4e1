from conftest import collect_map
from linkgraph.operators.lpa import communities_canonical, label_propagation


def test_lpa_two_cliques(two_cliques_bridge):
    res = label_propagation(two_cliques_bridge, max_iter=30)
    labels = communities_canonical(res.state)
    got = collect_map(labels, "id", "community")
    c1 = {got[i] for i in range(1, 5)}
    c2 = {got[i] for i in range(11, 15)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert c1 == {1} and c2 == {11}  # canonical = min member


def test_lpa_deterministic(two_cliques_bridge):
    a = collect_map(label_propagation(two_cliques_bridge).state, "id", "label")
    b = collect_map(label_propagation(two_cliques_bridge).state, "id", "label")
    assert a == b


def test_lpa_isolated_keeps_own_label(spark):
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 2)], vertices=[1, 2, 9], directed=False)
    got = collect_map(label_propagation(g).state, "id", "label")
    assert got[9] == 9


def test_lpa_converged_idempotent(two_cliques_bridge):
    res = label_propagation(two_cliques_bridge, max_iter=30)
    assert res.stats[-1].delta == 0.0
