"""Time-respecting reachability vs pure-Python fixpoint oracle."""

import math
import random
from collections import defaultdict

import pytest

from linkgraph.operators.temporal import earliest_arrival
from linkgraph.operators.terms import pmi_collocations
from linkgraph.plans.iterate import ConvergenceError


def _py_earliest(edges, sources, start=0):
    arr = {s: start for s in sources}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if u in arr and t >= arr[u] and (v not in arr or t < arr[v]):
                arr[v] = t
                changed = True
    return arr


def _spark_earliest(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    s = spark.createDataFrame([(x,) for x in sources], "id long")
    got = earliest_arrival(e, s, **kw).collect()
    return {r.id: r.arrival for r in got}


def test_temporal_blocks_out_of_order_paths(spark):
    # 1→2 at t=5, 2→3 at t=3: statically 3 is reachable, temporally not
    edges = [(1, 2, 5), (2, 3, 3), (2, 4, 7)]
    got = _spark_earliest(spark, edges, [1])
    assert got == {1: 0, 2: 5, 4: 7}


def test_temporal_equal_times_chain(spark):
    # non-decreasing (not strictly increasing): same-day chains pass
    edges = [(1, 2, 4), (2, 3, 4)]
    got = _spark_earliest(spark, edges, [1])
    assert got == {1: 0, 2: 4, 3: 4}


def test_temporal_parallel_edges_pick_earliest_usable(spark):
    edges = [(1, 2, 9), (1, 2, 6), (2, 3, 7), (2, 3, 5)]
    got = _spark_earliest(spark, edges, [1])
    # arrive at 2 on day 6; the day-5 edge to 3 is already past, day-7 works
    assert got == {1: 0, 2: 6, 3: 7}


def test_temporal_matches_python_fixpoint_random(spark):
    rng = random.Random(17)
    edges = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(30))
        for _ in range(80)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    sources = [0, 5]
    got = _spark_earliest(spark, edges, sources)
    assert got == _py_earliest(edges, sources)


def test_temporal_start_parameter(spark):
    edges = [(1, 2, 5), (1, 3, 20)]
    got = _spark_earliest(spark, edges, [1], start=10)
    # the day-5 edge precedes the start time and is unusable
    assert got == {1: 10, 3: 20}


def test_temporal_exhaustion_raises(spark):
    edges = [(i, i + 1, i) for i in range(1, 8)]
    with pytest.raises(ConvergenceError):
        earliest_arrival(
            spark.createDataFrame(edges, "src long, dst long, ts long"),
            spark.createDataFrame([(1,)], "id long"),
            max_rounds=2,
        )


def test_pmi_collocations_match_brute_force(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a cat sat here and the cat sat there"),
        (4, "mat the cat sat on"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in pmi_collocations(df, min_count=2).collect()
    }
    uni = defaultdict(int)
    bi = defaultdict(int)
    for _, text in docs:
        toks = text.split()
        for w in toks:
            uni[w] += 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    n = sum(uni.values())
    nb = sum(bi.values())
    exp = {
        p: (c, round(math.log((c * 1.0 * n * n) / (nb * 1.0 * uni[p[0]] * uni[p[1]])), 6))
        for p, c in bi.items()
        if c >= 2
    }
    assert got == exp
