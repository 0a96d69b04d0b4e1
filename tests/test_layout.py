import math

from conftest import graph_from_edges
from linkgraph.operators.layout import (
    circular_layout,
    random_layout,
    rescale_layout,
    shell_layout,
    spiral_layout,
    spring_layout_sampled,
)


def _pos(df):
    return {r["id"]: (r["x"], r["y"]) for r in df.collect()}


def test_circular_geometry(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4)], vertices=[1, 2, 3, 4])
    pos = _pos(circular_layout(g, scale=2.0))
    assert len(pos) == 4
    for x, y in pos.values():
        assert abs(math.hypot(x, y) - 2.0) < 1e-9  # on the circle
    # distinct angles
    assert len({(round(x, 9), round(y, 9)) for x, y in pos.values()}) == 4


def test_circular_single_node_at_center(spark):
    g = graph_from_edges(spark, [], vertices=[7])
    assert _pos(circular_layout(g, center=(3.0, 4.0)))[7] == (3.0, 4.0)


def test_shell_layout_radii(spark):
    g = graph_from_edges(spark, [(1, 2)], vertices=[1, 2, 3, 4])
    pos = _pos(shell_layout(g, [[1], [2, 3, 4]], scale=2.0))
    assert pos[1] == (0.0, 0.0)  # singleton shell at center
    for v in (2, 3, 4):
        assert abs(math.hypot(*pos[v]) - 2.0) < 1e-9


def test_spiral_monotone_radius(spark):
    g = graph_from_edges(spark, [], vertices=range(10))
    pos = circ = _pos(spiral_layout(g))
    assert len(pos) == 10
    assert max(max(abs(x), abs(y)) for x, y in pos.values()) <= 1.0 + 1e-9


def test_random_layout_seeded(spark):
    g = graph_from_edges(spark, [], vertices=range(20))
    a, b = _pos(random_layout(g, seed=5)), _pos(random_layout(g, seed=5))
    assert a == b  # deterministic under a fixed seed


def test_rescale(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 14.0, 10.0)], "id long, x double, y double"
    )
    pos = _pos(rescale_layout(df, scale=1.0))
    assert abs(pos[1][0] + 1.0) < 1e-9 and abs(pos[2][0] - 1.0) < 1e-9
    assert pos[1][1] == 0.0  # centered


def test_spring_sampled(spark, two_cliques_bridge):
    pos = _pos(spring_layout_sampled(two_cliques_bridge))
    assert len(pos) == 8
    # cliques land closer to their own members than to the other clique
    import statistics

    def centroid(ids):
        xs = [pos[i][0] for i in ids]
        ys = [pos[i][1] for i in ids]
        return statistics.mean(xs), statistics.mean(ys)

    c1, c2 = centroid(range(1, 5)), centroid(range(11, 15))
    assert math.hypot(c1[0] - c2[0], c1[1] - c2[1]) > 0.5


def test_spring_refuses_large(spark):
    import pytest

    g = graph_from_edges(spark, [], vertices=range(100))
    with pytest.raises(ValueError):
        spring_layout_sampled(g, max_nodes=50)


def test_kamada_kawai_weighted_distances(spark):
    """weighted=True uses weighted APSP: on a 3-path with one heavy
    edge, the heavy pair lands proportionally farther apart than in
    the hop-distance layout."""
    import math

    from conftest import graph_from_edges
    from linkgraph.operators.layout import kamada_kawai_layout

    g = graph_from_edges(
        spark, [(1, 2, 1.0), (2, 3, 10.0)], directed=False
    )
    pos = {
        r["id"]: (r["x"], r["y"])
        for r in kamada_kawai_layout(g, weighted=True, iterations=500).collect()
    }

    def d(a, b):
        return math.dist(pos[a], pos[b])

    # stress optimum reproduces the 1:10 distance ratio (path graphs
    # embed isometrically on a line)
    assert d(1, 2) < 0.3 * d(2, 3)
    ratio = d(1, 3) / (d(1, 2) + d(2, 3))
    assert 0.9 < ratio <= 1.01
