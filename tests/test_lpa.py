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


def test_lpa_oscillation_stops_loudly(spark, capfd):
    """A 2-vertex graph 2-cycles under synchronous updates (each
    vertex adopts the other's label every round). The driver loop
    must detect the period-2 state recurrence and stop deterministically
    instead of silently burning max_iter rounds."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 2)], directed=False)
    res = label_propagation(g, max_iter=50)
    # detection fires as soon as the round-0 state recurs (round 2)
    assert res.iterations <= 4
    assert res.stats[-1].delta == 0.0
    assert "oscillation detected" in capfd.readouterr().err
    # deterministic: the same stopping state every run
    a = collect_map(res.state, "id", "label")
    b = collect_map(label_propagation(g, max_iter=50).state, "id", "label")
    assert a == b


def test_lpa_weight_expr_json(spark):
    """weight_expr parity with PageRank/SSSP: vote weights extracted
    from a JSON attrs column steer the argmax away from the
    unweighted tie-break."""
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph

    rows = [
        (1, 2, 1.0, '{"w": 1.0}'),
        (2, 4, 1.0, '{"w": 10.0}'),
        (1, 4, 1.0, '{"w": 1.0}'),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")
    g = LinkGraph(e, directed=False)
    unweighted = collect_map(label_propagation(g, max_iter=1).state, "id", "label")
    weighted = collect_map(
        label_propagation(
            g, max_iter=1, weight_expr=F.get_json_object("attrs", "$.w")
        ).state,
        "id",
        "label",
    )
    # node 4's neighbors: 1 (w=1) and 2 (w=10) — unweighted ties to the
    # smaller label, the JSON weight flips the vote to 2
    assert unweighted[4] == 1
    assert weighted[4] == 2
