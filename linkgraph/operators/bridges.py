"""Bridges and 2-edge-connected components, distributed.

A bridge is an edge whose removal disconnects its component — the
classical single-point-of-failure readout (link-graph use: tendril
attachments and single-path site entrances; every bridge endpoint
below the cut is unreachable if one link rots). The reference has no
bridge surface (web-pipeline inventory, SURVEY §2.8b); semantics are
pinned to ``networkx.bridges`` on the simple undirected view.

Tarjan's low-link test recast for a rooted BFS forest — the interval
form is valid for ANY rooted spanning forest, not just DFS trees,
because it never uses DFS-specific edge classification, only the fact
that a subtree owns a contiguous preorder interval:

1. WCC labels every vertex with its component's min id — the root set.
2. One multi-source BFS from all roots builds the spanning forest
   (parent = smallest-id BFS predecessor — deterministic).
3. Subtree sizes fold bottom-up, one filtered join + map-side-combined
   agg per depth level.
4. Preorder intervals assign top-down: ``tin(c) = tin(parent) + 1 +
   Σ sizes of smaller-id siblings``; ``tout = tin + size − 1``. The
   sibling prefix sum is two-level bucketed (approx-percentile buckets
   + per-(parent, bucket) windows + a bounded per-parent offset agg —
   politeness_schedule's shape), so a hub's million BFS children never
   rank inside one window task; the result is exact whatever the
   boundary estimates.
5. ``low/high(v)`` = min/max tin over v and its non-tree neighbors,
   folded bottom-up. Tree edge (parent, c) is a bridge iff subtree(c)
   keeps ``[low, high] ⊆ [tin(c), tout(c)]`` — no non-tree edge leaves
   the subtree (a leaving edge's far endpoint has tin outside the
   interval, since intervals are contiguous).

Cost: one BFS sweep + three depth sweeps = O(4·depth) rounds, the
same cost class as BFS itself on a web graph's shallow diameter; every
round is a co-partitioned join + agg, nothing ever collects. Parallel
rows and reciprocal directed pairs collapse to one simple undirected
edge first (a doubled edge is a 2-cycle and can never be a bridge
only if BOTH copies are real parallel edges — multigraph callers
should test multiplicity separately; this operator answers the simple
view, like NetworkX).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.components import weakly_connected_components
from linkgraph.plans.iterate import LineageChain


def _simple_sym(graph: LinkGraph) -> DataFrame:
    """Both directions of the distinct canonical self-loop-free edge
    set (the simple undirected view)."""
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def spanning_forest(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """Rooted BFS spanning forest: DataFrame(id, parent, depth, root).
    Root of each component = its min vertex id (parent NULL, depth 0);
    parent = the smallest-id BFS predecessor, so the forest is a pure
    function of the edge set."""
    comp = weakly_connected_components(graph, max_iter=max_iter).state
    sym = _simple_sym(graph)
    chain_t, chain_f = LineageChain(), LineageChain()
    tree = chain_t.cut(
        comp.select(
            "id",
            F.when(F.col("id") == F.col("component"), F.lit(None))
            .cast("long")
            .alias("parent"),
            F.when(F.col("id") == F.col("component"), 0)
            .cast("long")
            .alias("depth"),
            F.col("component").alias("root"),
        )
    )
    frontier = chain_f.cut(tree.filter("depth = 0").select("id"))
    d = 0
    while frontier.limit(1).count() > 0:
        d += 1
        if d > max_iter:
            raise RuntimeError("spanning_forest: BFS exceeded max_iter")
        grown = (
            sym.join(frontier.withColumnRenamed("id", "_f"), sym.src == F.col("_f"))
            .join(
                tree.filter("depth IS NOT NULL").select(F.col("id").alias("_v")),
                sym.dst == F.col("_v"),
                "left_anti",
            )
            .groupBy(F.col("dst").alias("_id"))
            .agg(F.min("src").alias("_parent"))
        )
        tree = chain_t.cut(
            tree.join(grown, tree.id == grown._id, "left").select(
                "id",
                F.coalesce("parent", "_parent").alias("parent"),
                F.coalesce("depth", F.when(F.col("_id").isNotNull(), F.lit(d))).alias(
                    "depth"
                ),
                "root",
            )
        )
        frontier = chain_f.cut(tree.filter(F.col("depth") == d).select("id"))
    chain_f.release()
    return tree


def _sibling_prefix(kids: DataFrame, n_buckets: int = 32) -> DataFrame:
    """(id, parent, size) → (id, before): per parent, the sum of
    ``size`` over smaller-id siblings. Two-level bucketed so a hub
    parent's children never rank in one window task; exact whatever
    the percentile boundaries land on (bucketing by id is
    order-monotone)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = kids.groupBy("parent").agg(
        F.expr(
            f"percentile_approx(id, array({','.join(str(x) for x in probs)}), 10000)"
        ).alias("bs")
    )
    bucketed = kids.join(bounds, "parent").select(
        "parent",
        "id",
        "size",
        F.aggregate(
            "bs", F.lit(0), lambda acc, b: acc + F.when(b < F.col("id"), 1).otherwise(0)
        ).alias("b"),
    )
    totals = bucketed.groupBy("parent", "b").agg(F.sum("size").alias("c"))
    offsets = (
        totals.groupBy("parent")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"))
        .select(
            "parent",
            F.explode(
                F.expr(
                    f"""transform(sequence(0, {n_buckets - 1}), b -> struct(
                        b AS b,
                        aggregate(sequence(0, {n_buckets - 1}),
                                  0L,
                                  (acc, i) -> acc + CASE WHEN i < b
                                      THEN coalesce(element_at(m, i), 0L)
                                      ELSE 0L END) AS off))"""
                )
            ).alias("e"),
        )
        .select("parent", F.col("e.b").alias("b"), F.col("e.off").alias("off"))
    )
    w = (
        Window.partitionBy("parent", "b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.withColumn("_within", F.coalesce(F.sum("size").over(w), F.lit(0)))
        .join(offsets, ["parent", "b"])
        .select("id", (F.col("off") + F.col("_within")).alias("before"))
    )


def _forest_intervals(tree: DataFrame) -> DataFrame:
    """(id, parent, depth, root) → + (size, tin, tout): preorder
    intervals of the rooted forest, children ordered by id. One
    bottom-up sweep (sizes) + one top-down sweep (tin), each a
    filtered join + agg per depth level."""
    chain = LineageChain()
    dmax = tree.agg(F.max("depth")).collect()[0][0] or 0
    sized = tree.withColumn("size", F.lit(1).cast("long"))
    for d in range(int(dmax), 0, -1):
        up = (
            sized.filter(F.col("depth") == d)
            .groupBy(F.col("parent").alias("_p"))
            .agg(F.sum("size").alias("_s"))
        )
        sized = sized.join(up, sized.id == F.col("_p"), "left").select(
            "id",
            "parent",
            "depth",
            "root",
            (F.col("size") + F.coalesce("_s", F.lit(0))).alias("size"),
        )
        if d % 3 == 0 or d == 1:
            sized = chain.cut(sized)
    tin_chain = LineageChain()
    tin = tin_chain.cut(
        sized.filter("depth = 0").select("id", F.lit(0).cast("long").alias("tin"))
    )
    for d in range(1, int(dmax) + 1):
        kids = sized.filter(F.col("depth") == d).select("id", "parent", "size")
        before = _sibling_prefix(kids)
        level = (
            kids.join(before, "id")
            .join(
                tin.select(F.col("id").alias("_pid"), F.col("tin").alias("_ptin")),
                kids.parent == F.col("_pid"),
            )
            .select(
                "id", (F.col("_ptin") + 1 + F.col("before")).alias("tin")
            )
        )
        tin = tin_chain.cut(tin.unionByName(level))
    out = sized.join(tin, "id").select(
        "id",
        "parent",
        "depth",
        "root",
        "size",
        "tin",
        (F.col("tin") + F.col("size") - 1).alias("tout"),
    )
    return out


def _subtree_lowhigh(iv: DataFrame, nontree_sym: DataFrame) -> DataFrame:
    """(id, parent, depth, tin, tout) + symmetrized non-tree edges →
    + (low, high): per vertex, the min/max preorder time reachable
    from its SUBTREE through a non-tree edge (own tin included),
    folded bottom-up — one filtered join + map-side-combined agg per
    depth level, lineage hard-cut every 3rd level."""
    nbr = (
        nontree_sym.join(
            iv.select(F.col("id").alias("_n"), F.col("tin").alias("_ntin")),
            nontree_sym.dst == F.col("_n"),
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("_ntin").alias("_mn"), F.max("_ntin").alias("_mx"))
    )
    state = iv.join(nbr, "id", "left").select(
        "id",
        "parent",
        "depth",
        "tin",
        "tout",
        F.least("tin", "_mn").alias("low"),
        F.greatest("tin", "_mx").alias("high"),
    )
    chain = LineageChain()
    dmax = int(iv.agg(F.max("depth")).collect()[0][0] or 0)
    for d in range(dmax, 0, -1):
        up = (
            state.filter(F.col("depth") == d)
            .groupBy(F.col("parent").alias("_p"))
            .agg(F.min("low").alias("_l"), F.max("high").alias("_h"))
        )
        state = state.join(up, state.id == F.col("_p"), "left").select(
            "id",
            "parent",
            "depth",
            "tin",
            "tout",
            F.least("low", "_l").alias("low"),
            F.greatest("high", "_h").alias("high"),
        )
        if d % 3 == 0 or d == 1:
            state = chain.cut(state)
    return state


def bridges(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """DataFrame(src, dst) — every bridge of the simple undirected
    view, canonical src < dst. Matches ``networkx.bridges``."""
    tree = spanning_forest(graph, max_iter=max_iter)
    iv = _forest_intervals(tree).persist()
    iv.count()
    tree_edges = iv.filter("parent IS NOT NULL").select(
        F.least("parent", "id").alias("src"), F.greatest("parent", "id").alias("dst")
    )
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nontree = und.join(tree_edges, ["src", "dst"], "left_anti")
    nontree_sym = nontree.unionAll(
        nontree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    state = _subtree_lowhigh(iv, nontree_sym)
    out = (
        state.filter("parent IS NOT NULL")
        .filter((F.col("low") >= F.col("tin")) & (F.col("high") <= F.col("tout")))
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
        )
    )
    from linkgraph.plans.iterate import truncate_lineage

    # materialize before releasing the interval cache the plan reads
    result = truncate_lineage(out)
    iv.unpersist()
    return result


def two_edge_components(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """DataFrame(id, component) — 2-edge-connected components of the
    simple undirected view: component = min vertex id among vertices
    mutually reachable after every bridge is removed (bridge endpoints
    that become isolated form singleton components). Composition:
    ``bridges`` + one anti-join + the engine's WCC."""
    b = bridges(graph, max_iter=max_iter)
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    rest = und.join(b, ["src", "dst"], "left_anti")
    verts = graph.vertices.select("id")
    g2 = LinkGraph(rest, verts, directed=False)
    return weakly_connected_components(g2, max_iter=max_iter).state


def _tree_blocks(graph: LinkGraph, max_iter: int) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared Tarjan–Vishkin core: returns ``(iv, blocks, nontree)``
    where ``iv`` is the PERSISTED interval table (caller unpersists),
    ``blocks`` is DataFrame(id, component) assigning every non-root
    vertex's tree edge e_v = (parent(v), v) its biconnected
    component, and ``nontree`` is the canonical non-tree edge set.

    Tarjan & Vishkin (SIAM J. Comput. 1985) reduce biconnectivity to
    connectivity on an auxiliary graph over the spanning forest's
    tree edges; their two rules need only subtree intervals and
    low/high, never DFS edge classification, so the engine's rooted
    BFS forest qualifies:

    - rule (i): a non-tree edge {u, w} with NEITHER endpoint an
      ancestor of the other joins e_u — e_w (its fundamental cycle
      contains both; the rest of the cycle's tree path is picked up
      by rule (ii) chains).
    - rule (ii): tree edge e_w joins its parent edge e_v (v =
      parent(w), v non-root) iff subtree(w) has a non-tree edge
      leaving subtree(v) — i.e. low(w) < tin(v) or high(w) > tout(v).
      A non-tree edge from subtree(w) to v ITSELF lands exactly on
      tin(v) and correctly does NOT join (its cycle stops at v).

    Components of the auxiliary graph = biconnected components; the
    auxiliary WCC runs with pointer jumping because a length-n cycle
    collapses to a length-n auxiliary path (min-label alone would
    need n rounds where jumping needs O(log n))."""
    tree = spanning_forest(graph, max_iter=max_iter)
    iv = _forest_intervals(tree).persist()
    iv.count()
    tree_edges = iv.filter("parent IS NOT NULL").select(
        F.least("parent", "id").alias("src"), F.greatest("parent", "id").alias("dst")
    )
    und = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nontree = und.join(tree_edges, ["src", "dst"], "left_anti")
    nontree_sym = nontree.unionAll(
        nontree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    state = _subtree_lowhigh(iv, nontree_sym)
    piv = iv.filter("parent IS NOT NULL").select(
        F.col("id").alias("_v"),
        F.col("tin").alias("_vtin"),
        F.col("tout").alias("_vtout"),
    )
    rule2 = (
        state.filter(F.col("depth") >= 2)
        .join(piv, state.parent == F.col("_v"))
        .filter((F.col("low") < F.col("_vtin")) | (F.col("high") > F.col("_vtout")))
        .select(F.col("id").alias("src"), F.col("_v").alias("dst"))
    )
    tu = iv.select(
        F.col("id").alias("src"), F.col("tin").alias("_utin"), F.col("tout").alias("_utout")
    )
    tw = iv.select(
        F.col("id").alias("dst"), F.col("tin").alias("_wtin"), F.col("tout").alias("_wtout")
    )
    # a root is the ancestor of its whole component, so rule (i)'s
    # unrelatedness filter never admits a root endpoint — every
    # auxiliary vertex below is a genuine tree-edge key
    rule1 = (
        nontree.join(tu, "src")
        .join(tw, "dst")
        .filter(
            ~((F.col("_wtin") >= F.col("_utin")) & (F.col("_wtin") <= F.col("_utout")))
        )
        .filter(
            ~((F.col("_utin") >= F.col("_wtin")) & (F.col("_utin") <= F.col("_wtout")))
        )
        .select("src", "dst")
    )
    aux_verts = iv.filter("parent IS NOT NULL").select("id")
    gaux = LinkGraph(
        rule2.unionByName(rule1).withColumn("weight", F.lit(1.0)),
        aux_verts,
        directed=False,
    )
    blocks = weakly_connected_components(gaux, max_iter=max_iter, jump=True).state
    return iv, blocks, nontree


def biconnected_components(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """DataFrame(src, dst, block) — every edge of the simple
    undirected view (canonical src < dst) labeled with its biconnected
    component. Block ids are deterministic: the min vertex id among
    the block's tree-edge child endpoints (the auxiliary WCC's
    min-label). Edge partition matches
    ``networkx.biconnected_component_edges``; a bridge is exactly a
    single-edge block, so this strictly refines ``bridges``."""
    iv, blocks, nontree = _tree_blocks(graph, max_iter=max_iter)
    tb = blocks.select(F.col("id").alias("_b"), F.col("component").alias("block"))
    out_tree = (
        iv.filter("parent IS NOT NULL")
        .join(tb, iv.id == F.col("_b"))
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
            "block",
        )
    )
    # a non-tree edge takes its deeper (larger-tin) endpoint's block:
    # for an ancestor edge that is the descendant end (the cycle's
    # tree edges all chain to it); for a cross edge rule (i) made the
    # two ends agree, so either would do
    tins = iv.select(F.col("id").alias("_t"), F.col("tin").alias("_tin"))
    deep = (
        nontree.join(tins.withColumnRenamed("_t", "src").withColumnRenamed("_tin", "_utin"), "src")
        .join(tins.withColumnRenamed("_t", "dst").withColumnRenamed("_tin", "_wtin"), "dst")
        .select(
            "src",
            "dst",
            F.when(F.col("_wtin") > F.col("_utin"), F.col("dst"))
            .otherwise(F.col("src"))
            .alias("_k"),
        )
    )
    out_non = deep.join(tb, deep._k == F.col("_b")).select("src", "dst", "block")
    from linkgraph.plans.iterate import truncate_lineage

    result = truncate_lineage(out_tree.unionByName(out_non))
    iv.unpersist()
    return result


def articulation_points(graph: LinkGraph, max_iter: int = 10_000) -> DataFrame:
    """DataFrame(id) — every cut vertex of the simple undirected view
    (removal disconnects its component). Matches
    ``networkx.articulation_points``. Readout over the tree-edge
    blocks: a non-root v is a cut vertex iff some child edge lies in
    a different block than v's own parent edge; a root iff its child
    edges span ≥ 2 blocks (leaves and isolated vertices have no child
    edges and never qualify)."""
    iv, blocks, _ = _tree_blocks(graph, max_iter=max_iter)
    kb = (
        iv.filter("parent IS NOT NULL")
        .select("id", "parent")
        .join(blocks, "id")
        .select("parent", F.col("component").alias("cb"))
    )
    agg = kb.groupBy("parent").agg(
        F.countDistinct("cb").alias("nb"), F.min("cb").alias("one_cb")
    )
    pb = blocks.select(F.col("id").alias("parent"), F.col("component").alias("pblock"))
    out = (
        agg.join(pb, "parent", "left")
        .filter(
            (F.col("nb") >= 2)
            | (F.col("pblock").isNotNull() & (F.col("one_cb") != F.col("pblock")))
        )
        .select(F.col("parent").alias("id"))
    )
    from linkgraph.plans.iterate import truncate_lineage

    result = truncate_lineage(out)
    iv.unpersist()
    return result
