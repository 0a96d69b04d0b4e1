from conftest import collect_map, graph_from_edges
from linkgraph.operators.traversal import (
    bfs_levels,
    reachable_from,
    reconstruct_path,
    shortest_paths,
)
from oracles import sssp_oracle


def test_bfs_levels(bfs_dag):
    got = collect_map(bfs_levels(bfs_dag, 1), "id", "level")
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_reachable_set(bfs_dag):
    # DFS visit-set semantics (lib.rs:124-127): reachability from B
    got = {r["id"] for r in reachable_from(bfs_dag, 2).collect()}
    assert got == {2, 3, 5}


def test_sssp_diamond(diamond_weighted):
    dists = shortest_paths(diamond_weighted, 1)
    got = collect_map(dists, "id", "dist")
    assert got == {1: 0.0, 2: 1.0, 3: 3.0, 4: 4.0}
    path, cost = reconstruct_path(dists, 1, 4)
    assert path == [1, 2, 3, 4] and cost == 4.0  # lib.rs:152-172 assert


def test_sssp_cycle(cycle_weighted):
    # graph_tests.rs:239-276: A→D cost 5 and D→B cost 7
    got = collect_map(shortest_paths(cycle_weighted, 1), "id", "dist")
    assert got[4] == 5.0
    got_d = collect_map(shortest_paths(cycle_weighted, 4), "id", "dist")
    assert got_d[2] == 7.0


def test_sssp_unreachable(bfs_dag):
    got = collect_map(shortest_paths(bfs_dag, 3), "id", "dist")
    assert set(got) == {3}  # nothing downstream of C
    assert reconstruct_path(shortest_paths(bfs_dag, 3), 3, 1) is None


def test_sssp_random_vs_dijkstra(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    edges = []
    seen = set()
    for _ in range(300):
        a, b = int(rng.randint(0, 60)), int(rng.randint(0, 60))
        if a != b and (a, b) not in seen:
            seen.add((a, b))
            edges.append((a, b, float(rng.uniform(1, 10))))
    g = graph_from_edges(spark, edges, vertices=range(60))
    got = collect_map(shortest_paths(g, 0), "id", "dist")
    want = sssp_oracle([(a, b, w) for a, b, w in edges], 0)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_bfs_undirected(two_components):
    got = collect_map(bfs_levels(two_components, 1), "id", "level")
    assert got == {1: 0, 2: 1}  # other component unreached


def test_bfs_direction_optimizing_matches_plain(spark):
    """Beamer hybrid BFS computes exactly plain BFS levels — forced
    into the bottom-up regime early (alpha tiny) and with the
    switch-back exercised (beta tiny), on directed and undirected
    random graphs."""
    import random

    from conftest import graph_from_edges

    rng = random.Random(7)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(260)})
    edges = [(a, b) for a, b in edges if a != b]
    for directed in (True, False):
        g = graph_from_edges(spark, edges, directed=directed)
        plain = collect_map(bfs_levels(g, edges[0][0]), "id", "level")
        for alpha, beta in ((0.01, 0.5), (4.0, 24.0), (1e9, 24.0)):
            hybrid = collect_map(
                bfs_levels(
                    g,
                    edges[0][0],
                    direction_optimizing=True,
                    alpha=alpha,
                    beta=beta,
                ),
                "id",
                "level",
            )
            assert hybrid == plain, (directed, alpha, beta)


def test_bfs_direction_optimizing_star(spark):
    """A star forces the extreme asymmetry: level 1 is every other
    vertex, so the hybrid goes bottom-up immediately and must still
    terminate and agree."""
    from conftest import graph_from_edges

    edges = [(0, i) for i in range(1, 40)]
    g = graph_from_edges(spark, edges, directed=False)
    plain = collect_map(bfs_levels(g, 0), "id", "level")
    hybrid = collect_map(
        bfs_levels(g, 0, direction_optimizing=True, alpha=0.1), "id", "level"
    )
    assert hybrid == plain
    assert plain == {0: 0, **{i: 1 for i in range(1, 40)}}


def test_reconstruct_path_pointer_doubling_deep_chain(spark):
    """The large-frame branch reconstructs a 10k-hop path by pointer
    doubling — O(log L) rounds, not one Spark job per hop — and its
    output equals the driver-side walk exactly."""
    from pyspark.sql import functions as F

    from linkgraph.operators.traversal import reconstruct_path

    n = 10_000  # path 0 → 9999: 10k nodes, inside max_len
    dists = spark.range(n).select(
        F.col("id"),
        F.col("id").cast("double").alias("dist"),
        F.when(F.col("id") > 0, F.col("id") - 1).alias("via"),
    )
    sc = spark.sparkContext
    sc.setJobGroup("rp_doubling", "pointer doubling reconstruct")
    try:
        got = reconstruct_path(dists, 0, n - 1, collect_threshold=0)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("rp_doubling")
    want = reconstruct_path(dists, 0, n - 1)  # driver-side walk
    assert got is not None and want is not None
    assert got[0] == want[0] == list(range(n))
    assert got[1] == want[1] == float(n - 1)
    # ⌈log2 10k⌉ = 14 rounds; AQE materializes each round's two
    # shuffles as a handful of sub-jobs — still two orders of
    # magnitude under the ~10k jobs a per-hop walk schedules
    assert len(jobs) <= 150, len(jobs)
    # truncation semantics match the walk: max_len caps path length
    short = reconstruct_path(dists, 0, n - 1, max_len=5, collect_threshold=0)
    assert short is not None and len(short[0]) == 5
    assert short[0] == list(range(n - 5, n))
    # absent target
    assert reconstruct_path(dists, 0, 10 * n, collect_threshold=0) is None
