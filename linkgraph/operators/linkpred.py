"""Link prediction and global graph metrics.

NetworkX's link-prediction surface (``jaccard_coefficient``,
``adamic_adar_index``, ``common_neighbors``,
``preferential_attachment``) defaults to scoring ALL non-edges —
O(V²), fatal at web scale. The scalable contract here scores the
distance-2 candidate set (non-adjacent pairs with >= 1 common
neighbor) — exactly the pairs where common-neighbor scores are
non-zero — produced by one wedge self-join on the degree-bounded
simple projection, the same shape as triangle counting. An explicit
``candidates`` frame restores the NetworkX any-pair semantics when
needed; per-pair values match NetworkX exactly either way
(tests/test_linkpred.py).

``graph_summary`` is the global-metric scalar row (density,
transitivity, degree assortativity) — one pass of aggregations over
the simple projection plus the engine's oriented triangle count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.triangles import total_triangles


def _simple_projection(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """(canonical a<b simple edges, per-vertex simple degrees) of the
    undirected simple projection (self-loops and parallel edges
    dropped — the NetworkX link-prediction domain, which rejects
    multigraphs outright)."""
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionAll(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    return canon, deg


def link_prediction_scores(
    graph: LinkGraph, candidates: DataFrame | None = None
) -> DataFrame:
    """DataFrame(u, v, common_neighbors, jaccard, adamic_adar,
    preferential_attachment), u < v.

    ``candidates`` None scores every non-adjacent distance-2 pair
    (the pairs with common_neighbors >= 1); a DataFrame(u, v) scores
    exactly those pairs (zero-common pairs included, scores 0/0/0/
    deg·deg — the NetworkX ebunch semantics). Formulas match
    NetworkX: jaccard = |Γu∩Γv| / |Γu∪Γv|, adamic_adar =
    Σ_{z∈Γu∩Γv} 1/ln(deg z) (common neighbors always have deg >= 2,
    so the log never vanishes), preferential_attachment =
    deg(u)·deg(v)."""
    canon, deg = _simple_projection(graph)
    canon = canon.persist()
    # both orientations once: wedges z—u, z—v enumerate each unordered
    # pair exactly once via u < v
    sym = canon.select(F.col("a").alias("z"), F.col("b").alias("x")).unionAll(
        canon.select(F.col("b").alias("z"), F.col("a").alias("x"))
    )
    dz = deg.select(F.col("id").alias("z"), F.col("deg").alias("deg_z"))
    e1 = sym.join(dz, "z").select("z", F.col("x").alias("u"), "deg_z")
    e2 = sym.select("z", F.col("x").alias("v"))
    wedges = e1.join(e2, "z").filter(F.col("u") < F.col("v"))
    cn = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("deg_z").cast("double"))).alias("adamic_adar"),
    )
    if candidates is not None:
        # NetworkX ebunch semantics: score exactly the given pairs —
        # including adjacent ones and pairs touching isolated vertices
        pairs = candidates.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).distinct()
        cn = pairs.join(cn, ["u", "v"], "left").select(
            "u", "v",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
        )
    else:
        # default candidate set: non-adjacent distance-2 pairs
        cn = cn.join(
            canon.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    union_size = F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")
    out = (
        cn.join(du, "u", "left")
        .join(dv, "v", "left")
        .withColumn("deg_u", F.coalesce("deg_u", F.lit(0)))
        .withColumn("deg_v", F.coalesce("deg_v", F.lit(0)))
        .select(
            "u", "v", "common_neighbors",
            F.when(union_size > 0, F.col("common_neighbors") / union_size)
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
            "adamic_adar",
            (F.col("deg_u") * F.col("deg_v")).alias("preferential_attachment"),
        )
    )
    canon.unpersist()
    return out


def graph_summary(graph: LinkGraph) -> DataFrame:
    """One-row DataFrame(n_nodes, n_edges, density, transitivity,
    assortativity) over the undirected simple projection.

    density = 2m/(n(n-1)) (``networkx.density``); transitivity =
    3·triangles / wedges with wedges = Σ d(d-1)/2
    (``networkx.transitivity``); assortativity = Pearson correlation
    of endpoint degrees over both edge orientations
    (``networkx.degree_assortativity_coefficient``), null on
    degree-regular graphs where the variance vanishes."""
    spark = graph.edges.sparkSession
    canon, deg = _simple_projection(graph)
    canon = canon.persist()
    n = graph.vertices.count()
    m = canon.count()
    tri = total_triangles(LinkGraph(canon.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    ), directed=False))
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"] or 0.0
    sym = canon.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        canon.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    dx = deg.select(F.col("id").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("id").alias("y"), F.col("deg").alias("deg_y"))
    # explicit guarded Pearson: F.corr's internal division throws
    # under ANSI mode on degree-regular graphs (zero variance) —
    # NetworkX returns nan there; we return NULL
    stats = (
        sym.join(dx, "x").join(dy, "y")
        .select(
            F.col("deg_x").cast("double").alias("ax"),
            F.col("deg_y").cast("double").alias("ay"),
        )
        .agg(
            F.covar_pop("ax", "ay").alias("cxy"),
            F.var_pop("ax").alias("vx"),
            F.var_pop("ay").alias("vy"),
        )
        .select(
            F.when(
                (F.col("vx") > 0) & (F.col("vy") > 0),
                F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy")),
            ).alias("r")
        )
        .collect()[0]
    )
    assort = stats["r"]
    canon.unpersist()
    density = 2.0 * m / (n * (n - 1)) if n > 1 else 0.0
    transitivity = 3.0 * tri / wedges if wedges > 0 else 0.0
    return spark.createDataFrame(
        [(n, m, density, transitivity, assort)],
        "n_nodes long, n_edges long, density double, transitivity double, "
        "assortativity double",
    )


def reciprocity(graph: LinkGraph) -> DataFrame:
    """One-row DataFrame(n_edges, n_mutual, reciprocity) over the
    distinct directed edge pairs: the fraction of edges (u, v) whose
    reverse (v, u) is also present (``networkx.overall_reciprocity``;
    reference parity: networkx-rust exposes the same digraph edge
    surface this summarizes). NetworkX computes
    2·(m − m_undirected)/m, under which a self-loop is NOT
    reciprocated — mirrored here by excluding src = dst from the
    mutual count.

    Scale shape: one distinct on (src, dst) and one self-semi-join on
    the reversed key — both shuffles on the edge key, no per-vertex
    state, no driver loop.
    """
    if not graph.directed:
        raise ValueError("reciprocity is defined for directed graphs")
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_edges = e.count()
    n_mutual = (
        e.filter(F.col("src") != F.col("dst"))
        .join(rev, ["src", "dst"], "left_semi")
        .count()
    )
    return spark.createDataFrame(
        [(n_edges, n_mutual, (n_mutual / n_edges) if n_edges else 0.0)],
        "n_edges long, n_mutual long, reciprocity double",
    )


def average_neighbor_degree(
    graph: LinkGraph, source: str = "out", target: str = "out"
) -> DataFrame:
    """DataFrame(id, avg_nbr_degree): per-vertex mean degree of its
    neighborhood — ``networkx.average_neighbor_degree`` semantics.

    Directed graphs pick the neighborhood by ``source`` and the
    neighbors' degree by ``target``, each one of "out" / "in" /
    "in+out" (the NetworkX parameter surface); undirected graphs
    ignore both and use the symmetric adjacency on both sides.
    Multi-edges count with multiplicity, as in NetworkX; vertices
    with an empty neighborhood report 0.0.

    Scale shape: one degree aggregation (map-side combined), one
    edge⋈degree hash join keyed on the neighbor id, one groupBy on
    the vertex id — no driver loop, no per-vertex state beyond the
    two V-row frames.
    """

    def _pairs(direction: str) -> DataFrame:
        e = graph.edges.select("src", "dst")
        if not graph.directed:
            return graph.sym_edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        if direction == "out":
            return e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        if direction == "in":
            return e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        if direction == "in+out":
            return e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
                e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
            )
        raise ValueError(f"unknown direction {direction!r}")

    if not graph.directed:
        deg = graph.degrees().select(F.col("id").alias("v"), F.col("degree").alias("d"))
    elif target == "out":
        deg = graph.out_degrees().select(
            F.col("id").alias("v"), F.col("out_degree").alias("d")
        )
    elif target == "in":
        deg = graph.in_degrees().select(
            F.col("id").alias("v"), F.col("in_degree").alias("d")
        )
    elif target == "in+out":
        deg = graph.degrees().select(F.col("id").alias("v"), F.col("degree").alias("d"))
    else:
        raise ValueError(f"unknown direction {target!r}")

    nbr_avg = (
        _pairs(source)
        .join(deg, "v")
        .groupBy(F.col("u").alias("id"))
        .agg(F.avg("d").alias("a"))
    )
    return (
        graph.vertices.select("id")
        .join(nbr_avg, "id", "left")
        .select("id", F.coalesce("a", F.lit(0.0)).alias("avg_nbr_degree"))
    )


def cocitation_counts(
    graph: LinkGraph,
    mode: str = "cocitation",
    min_count: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """DataFrame(u, v, common), u < v: co-citation (pairs of pages
    linked FROM the same page — Small's co-citation strength) or
    bibliographic coupling (``mode="coupling"``: pairs of pages
    linking TO the same target — Kessler's measure). Directed graphs
    only; parallel edges collapse first.

    Scale shape: one self-join keyed on the shared center vertex —
    the wedge join, so a center of degree d emits d·(d−1)/2 pairs.
    That quadratic head is the OUTPUT semantics, not a plan defect;
    at web scale pass ``max_center_degree`` to drop mega-hub centers
    (the standard practice — a nav-bar page linking 10^4 targets
    carries no co-citation signal), which bounds per-center fan-out
    and keeps the shuffle key (the center id) un-skewed.
    """
    if not graph.directed:
        raise ValueError("cocitation_counts is defined for directed graphs")
    e = graph.edges.select("src", "dst").distinct()
    if mode == "cocitation":
        c = e.select(F.col("src").alias("c"), F.col("dst").alias("x"))
    elif mode == "coupling":
        c = e.select(F.col("dst").alias("c"), F.col("src").alias("x"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    if max_center_degree is not None:
        keep = (
            c.groupBy("c")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_center_degree)
            .select("c")
        )
        c = c.join(keep, "c", "left_semi")
    pairs = (
        c.select("c", F.col("x").alias("u"))
        .join(c.select("c", F.col("x").alias("v")), "c")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
    )
    return pairs.filter(F.col("common") >= min_count)


def attribute_assortativity(graph: LinkGraph, labels: DataFrame) -> DataFrame:
    """One-row DataFrame(r): categorical attribute assortativity —
    ``networkx.attribute_assortativity_coefficient`` exactly:
    r = (Σᵢ eᵢᵢ − Σᵢ aᵢ·bᵢ) / (1 − Σᵢ aᵢ·bᵢ) over the edge-normalized
    label mixing matrix (undirected graphs count each edge in both
    orientations, as NetworkX does). ``labels`` is DataFrame(id,
    label); edges with an unlabeled endpoint are dropped. r = 1 means
    perfect homophily, 0 random mixing, negative disassortative.

    Scale shape: two endpoint-keyed joins, one (label, label) groupBy
    (output rows = label-pair count, tiny), then label-keyed row/col
    sums — no V-row state on the driver, three scalar aggs.
    """
    lab = labels.select("id", "label")
    e = (graph.sym_edges if not graph.directed else graph.edges).select("src", "dst")
    pairs = (
        e.join(lab.select(F.col("id").alias("src"), F.col("label").alias("sl")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("dl")), "dst")
        .groupBy("sl", "dl")
        .agg(F.count("*").alias("c"))
    )
    total = pairs.agg(F.sum("c").alias("t"))
    m = pairs.crossJoin(F.broadcast(total)).select(
        "sl", "dl", (F.col("c") / F.col("t")).alias("e")
    )
    trace = m.filter(F.col("sl") == F.col("dl")).agg(
        F.coalesce(F.sum("e"), F.lit(0.0)).alias("tr")
    )
    a = m.groupBy("sl").agg(F.sum("e").alias("a"))
    b = m.groupBy("dl").agg(F.sum("e").alias("b"))
    ab = (
        a.join(b, a.sl == b.dl)
        .agg(F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0.0)).alias("ab"))
    )
    return (
        trace.crossJoin(F.broadcast(ab))
        .select(
            ((F.col("tr") - F.col("ab")) / (F.lit(1.0) - F.col("ab"))).alias("r")
        )
    )


def powerlaw_alpha(graph: LinkGraph, dmin: int = 2, degree: str = "in") -> DataFrame:
    """One-row DataFrame(n_tail, alpha): the discrete power-law tail
    exponent of the degree distribution by the Clauset–Shalizi–Newman
    MLE approximation α ≈ 1 + n·[Σ ln(dᵢ/(dmin − ½))]⁻¹ over degrees
    ≥ ``dmin`` — the number every web-graph paper reports for the
    in-degree head. ``degree``: "in"/"out"/"total" on directed
    graphs; undirected graphs use the undirected degree. One degree
    aggregation + one scalar agg; NULL alpha when the tail is empty
    or degenerate (all tail degrees at dmin with zero log-sum).
    """
    if dmin < 1:
        raise ValueError("dmin must be >= 1")
    if not graph.directed:
        deg = graph.degrees().select(F.col("degree").alias("d"))
    elif degree == "in":
        deg = graph.in_degrees().select(F.col("in_degree").alias("d"))
    elif degree == "out":
        deg = graph.out_degrees().select(F.col("out_degree").alias("d"))
    elif degree == "total":
        deg = graph.degrees().select(F.col("degree").alias("d"))
    else:
        raise ValueError(f"unknown degree {degree!r}")
    tail = deg.filter(F.col("d") >= dmin)
    return tail.agg(
        F.count("*").alias("n_tail"),
        F.when(
            F.sum(F.log(F.col("d") / F.lit(dmin - 0.5))) > 0,
            F.lit(1.0) + F.count("*") / F.sum(F.log(F.col("d") / F.lit(dmin - 0.5))),
        ).alias("alpha"),
    )


def rich_club_coefficients(graph: LinkGraph) -> DataFrame:
    """DataFrame(k, n_k, e_k, phi): the rich-club coefficient
    φ(k) = 2·E_k / (N_k·(N_k−1)) for every degree threshold k in
    [0, max_degree), where N_k/E_k count the vertices of degree > k
    and the edges among them — exactly
    ``networkx.rich_club_coefficient(normalized=False)`` over the
    simple undirected projection; rows only where N_k ≥ 2 (φ is
    undefined below that).

    Degree-histogram math, never per-k subgraphs: E_k is the
    above-k tail of the histogram of per-edge MIN endpoint degree,
    N_k the tail of the degree histogram. Every frame past the two
    degree joins is O(max_degree) rows regardless of graph size, so
    the k-sweep costs nothing at 10^12 edges.
    """
    spark = graph.edges.sparkSession
    canon, deg = _simple_projection(graph)
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("_db"))
    em = canon.join(da, "a").join(db, "b").select(
        F.least("_da", "_db").alias("m")
    )
    ehist = em.groupBy("m").agg(F.count("*").alias("ec"))
    dhist = deg.groupBy(F.col("deg").alias("d")).agg(F.count("*").alias("nc"))
    row = deg.agg(F.max("deg").alias("md")).collect()[0]
    if row["md"] is None:
        return spark.createDataFrame([], "k long, n_k long, e_k long, phi double")
    ks = spark.range(0, int(row["md"])).select(F.col("id").alias("k"))
    ek = (
        ks.join(ehist, ehist.m > ks.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ec"), F.lit(0)).alias("e_k"))
    )
    nk = (
        ks.join(dhist, dhist.d > ks.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nc"), F.lit(0)).alias("n_k"))
    )
    return (
        ek.join(nk, "k")
        .filter(F.col("n_k") >= 2)
        .select(
            "k",
            "n_k",
            "e_k",
            (2.0 * F.col("e_k") / (F.col("n_k") * (F.col("n_k") - 1))).alias("phi"),
        )
    )


def degree_connectivity(graph: LinkGraph) -> DataFrame:
    """DataFrame(k, knn): average nearest-neighbor degree of the
    degree-k vertices — ``networkx.average_degree_connectivity``
    (unweighted) over the simple undirected projection; the knn(k)
    curve whose slope is the assortativity story of a web graph. One
    degree agg, one edge⋈degree join, two groupBys.
    """
    canon, deg = _simple_projection(graph)
    pairs = canon.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        canon.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("_dv"))
    per_node = (
        pairs.join(dv, "v")
        .groupBy(F.col("u").alias("id"))
        .agg(F.avg("_dv").alias("_navg"))
    )
    return (
        per_node.join(deg, "id")
        .groupBy(F.col("deg").alias("k"))
        .agg(F.avg("_navg").alias("knn"))
    )
