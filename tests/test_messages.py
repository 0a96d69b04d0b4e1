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


# --- Pregel driver --------------------------------------------------------


def test_pregel_pagerank_matches_operator(spark):
    """An undamped-free PageRank written as a user vertex program
    through pregel() converges to the library operator's scores."""
    from linkgraph.operators.messages import pregel
    from linkgraph.operators.pagerank import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    g = graph_from_edges(spark, edges)
    n = g.vertices.count()
    alpha = 0.85
    # seed real out-degrees into the vertex state (every vertex here
    # has out-degree >= 1, so the message division is ANSI-safe)
    degs = {r["id"]: r["out_degree"] for r in g.out_degrees().collect()}
    deg_df = spark.createDataFrame(
        [(i, float(d)) for i, d in degs.items()], "id long, degv double"
    )
    g2 = graph_from_edges(spark, edges)
    from linkgraph import LinkGraph

    v2 = g2.vertices.join(deg_df, "id", "left").select(
        "id", F.coalesce("degv", F.lit(0.0)).alias("degv")
    )
    g2 = LinkGraph(g2.edges, v2, directed=True)
    res = pregel(
        g2,
        initial={"rank": F.lit(1.0 / n), "degv": F.col("degv")},
        agg=F.sum("msg").alias("agg"),
        to_dst=F.col("src_rank") / F.col("src_degv"),
        update={
            "rank": F.lit((1 - alpha) / n)
            + F.lit(alpha) * F.coalesce(F.col("agg"), F.lit(0.0)),
            "degv": F.col("degv"),
        },
        max_iter=80,
        delta=F.sum(F.abs(F.col("new_rank") - F.col("rank"))),
        tol=1e-12,
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    # compare against the library operator WITHOUT dangling handling:
    # no dangling vertices exist here (4→3 gives 4 out-degree 1), so
    # the operator's scores are the same fixpoint up to normalization
    want = {
        r["id"]: r["rank"]
        for r in pagerank(g2, alpha=alpha, tol=1e-12, max_iter=200)
        .state.collect()
    }
    scale = sum(want.values()) / sum(got.values())
    for i in want:
        assert abs(got[i] * scale - want[i]) < 1e-6, i


def test_pregel_max_propagation_and_validation(spark):
    from linkgraph.operators.messages import pregel

    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4), (5, 4)])
    res = pregel(
        g,
        initial={"m": F.col("id").cast("double")},
        agg=F.max("msg").alias("agg"),
        to_dst=F.col("src_m"),
        to_src=F.col("dst_m"),
        update={"m": F.greatest(F.col("m"), F.coalesce("agg", F.col("m")))},
        delta=F.sum(
            F.when(F.col("new_m") != F.col("m"), 1.0).otherwise(0.0)
        ),
        max_iter=20,
    )
    got = {r["id"]: r["m"] for r in res.state.collect()}
    assert got == {1: 5.0, 2: 5.0, 3: 5.0, 4: 5.0, 5: 5.0}
    assert res.iterations <= 6
    import pytest as _p

    with _p.raises(ValueError, match="update must redefine"):
        pregel(
            g,
            initial={"a": F.lit(0.0)},
            agg="sum",
            to_dst="weight",
            update={"b": F.lit(0.0)},
        )
