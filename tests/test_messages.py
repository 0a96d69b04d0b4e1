"""aggregateMessages primitive: degree/weighted-degree equivalence,
vertex-attribute messages through the triplet view, string exprs and
aggregate names, validation."""

import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph import LinkGraph
from linkgraph.operators.messages import aggregate_messages, triplets


EDGES = [(1, 2, 2.0), (1, 3, 1.5), (2, 3, 1.0), (3, 1, 4.0)]


@pytest.fixture
def mg(spark):
    return graph_from_edges(spark, EDGES)


def test_in_degree_equivalence(mg):
    got = {
        r["id"]: r["agg"]
        for r in aggregate_messages(
            mg, F.count("msg").alias("agg"), to_dst=F.lit(1),
            need_vertex_attrs=False,
        ).collect()
    }
    want = {}
    for _, d, _ in EDGES:
        want[d] = want.get(d, 0) + 1
    assert got == want
    ref = {r["id"]: r["in_degree"] for r in mg.in_degrees().collect()
           if r["in_degree"] > 0}
    assert got == ref


def test_weighted_both_directions(mg):
    got = {
        r["id"]: r["agg"]
        for r in aggregate_messages(
            mg, F.sum("msg").alias("agg"), to_dst="weight", to_src="weight",
            need_vertex_attrs=False,
        ).collect()
    }
    want = {}
    for s, d, w in EDGES:
        want[d] = want.get(d, 0.0) + w
        want[s] = want.get(s, 0.0) + w
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_vertex_attr_messages(spark):
    e = spark.createDataFrame(
        [(s, d, w) for s, d, w in EDGES], "src long, dst long, weight double"
    )
    v = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, score double"
    )
    g = LinkGraph(e, v, directed=True)
    t = triplets(g)
    assert {"src_score", "dst_score"} <= set(t.columns)
    # each dst receives src's score scaled by the edge weight
    got = {
        r["id"]: r["agg"]
        for r in aggregate_messages(
            g, F.sum("msg").alias("agg"),
            to_dst=F.col("src_score") * F.col("weight"),
        ).collect()
    }
    score = {1: 10.0, 2: 20.0, 3: 30.0}
    want = {}
    for s, d, w in EDGES:
        want[d] = want.get(d, 0.0) + score[s] * w
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_string_agg_name_and_validation(mg):
    got = {
        r["id"]: r["agg"]
        for r in aggregate_messages(
            mg, "max", to_dst="weight", need_vertex_attrs=False
        ).collect()
    }
    want = {}
    for s, d, w in EDGES:
        want[d] = max(want.get(d, 0.0), w)
    assert got == want
    with pytest.raises(ValueError, match="at least one"):
        aggregate_messages(mg, "sum")
