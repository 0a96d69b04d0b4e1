"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the query
block, JVM-side zip_with/aggregate dot products (no Python), window
top-k per query. Cost is |Q|·|corpus| dot products — fine when |Q| is
small or as the verifier behind a pruning stage.

The scale path is LSH bucketing (random-hyperplane signs): each
vector hashes to a bucket key; queries only score their bucket
(optionally multi-probe neighbors). At 10^12 rows the bucket join is
a plain co-partitioned equi-join; recall is tunable by planes/probes.

The IVF variant (coarse quantizer → inverted cells) slots into the
same cell-equi-join shape: each corpus vector lives in exactly one
cell (its nearest centroid), queries probe their ``nprobe`` nearest
cells. The quantizer is either seeded-random unit centroids (no
training pass — the contract-oracle path, constants reproducible on
both sides) or k-means trained DISTRIBUTED by ``kmeans_centroids``
(Lloyd's: one scan + one (cell, dim)-keyed aggregation per
iteration; the model collected per round is k×dim floats, never
data). Unlike multi-probe LSH, IVF probes are disjoint cells, so
candidates need no dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col):
    return F.col(col).cast("array<double>")


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    dot = F.aggregate(
        F.zip_with(_as_double(vec_col), _as_double(vec_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("_norm", F.sqrt(dot))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, sim). Ties broken by
    neighbor id ascending (deterministic). Queries are broadcast —
    the corpus never shuffles."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"), F.col("_norm").alias("cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"), F.col("_norm").alias("qn")
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (dot / (F.col("qn") * F.col("cn"))).alias("sim"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_col(vec_col: str, planes: np.ndarray):
    """Sign-pattern bucket id from fixed hyperplanes — pure column
    math (one dot product per plane, JVM-side)."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(_as_double(vec_col), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return acc


def plane_dots_col(vec_col: str, planes: np.ndarray):
    """Array of per-plane dot products (JVM-side) — the margins that
    drive multi-probe bucket selection."""
    cols = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        cols.append(
            F.aggregate(
                F.zip_with(_as_double(vec_col), plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    return F.array(*cols)


def _probe_buckets_col(dots, n_planes: int, multiprobe: int):
    """Base bucket + the ``multiprobe`` buckets obtained by flipping
    the planes with the smallest |margin| — classic multi-probe LSH
    (query-side only; the corpus layout is untouched)."""
    def bit(i):
        # 2^i with a Column exponent (F.shiftleft needs an int literal)
        return F.pow(F.lit(2.0), i.cast("double")).cast("long")

    base = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(F.element_at(dots, i + 1) >= 0, bit(i)).otherwise(F.lit(0).cast("long")),
    )
    if multiprobe <= 0:
        return F.array(base)
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda i: F.struct(
                F.abs(F.element_at(dots, i + 1)).alias("m"), i.alias("i")
            ),
        )
    )
    flips = F.transform(
        F.slice(ranked, 1, multiprobe),
        lambda s: base.bitwiseXOR(bit(s["i"])),
    )
    return F.concat(F.array(base), flips)


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.
    (query_id, neighbor_id, rank, sim). Recall < 1 by construction;
    the exact cosine_topk is the oracle it is measured against.

    ``multiprobe`` > 0 additionally probes that many neighbor buckets
    per query (flip the smallest-|margin| hyperplanes) — recall rises
    steeply at the cost of (1+multiprobe)× candidate joins, still
    bucket-equi-join shaped, corpus never rehashed."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        F.col("_norm").alias("cn"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    )
    dots = plane_dots_col(vec_col, planes)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        F.col("_norm").alias("qn"),
        F.explode(_probe_buckets_col(dots, n_planes, multiprobe)).alias("bucket"),
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        c.join(q, "bucket")  # co-partitioned equi-join on bucket key
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (dot / (F.col("qn") * F.col("cn"))).alias("sim"))
    )
    if multiprobe > 0:
        # a candidate found via several probes appears once
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    win = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def seeded_centroids(dim: int, n_cells: int = 8, seed: int = 7) -> np.ndarray:
    """Data-independent coarse quantizer: seeded random unit
    centroids. Reproducible as SQL constants, so IVF search is
    oracle-checkable end-to-end (the trained path below is
    pytest-verified instead)."""
    rng = np.random.RandomState(seed)
    c = rng.normal(size=(n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_sims_col(vec_col: str, centroids: np.ndarray):
    """Array of cosine-ranking scores against unit centroids: the
    row norm is constant per vector, so argmax of plain dot products
    IS the cosine argmax — one JVM-side dot per cell, no Python."""
    cols = []
    for c in centroids:
        cent = F.array(*[F.lit(float(x)) for x in c])
        cols.append(
            F.aggregate(
                F.zip_with(_as_double(vec_col), cent, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    return F.array(*cols)


def ivf_cell_col(vec_col: str, centroids: np.ndarray):
    """Nearest-centroid cell id (0-based), ties to the lowest cell —
    deterministic. Pure column math."""
    sims = _cell_sims_col(vec_col, centroids)
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                F.element_at(sims, i + 1).alias("s"), (-i).alias("negc")
            ),
        )
    )
    return (-best["negc"]).cast("int")


def _probe_cells_col(vec_col: str, centroids: np.ndarray, nprobe: int):
    """The ``nprobe`` nearest cells, nearest first (ties to lowest
    cell id)."""
    sims = _cell_sims_col(vec_col, centroids)
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                (-F.element_at(sims, i + 1)).alias("negs"), i.alias("c")
            ),
        )
    )
    return F.transform(
        F.slice(ranked, 1, nprobe), lambda s: s["c"].cast("int")
    )


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the IVF coarse quantizer with distributed Lloyd's
    iterations: assign = nearest-centroid column expression, update =
    posexplode → (cell, dim)-keyed sum/count aggregation. Only the
    k×dim model crosses to the driver each round; the data never
    does. Init: the ``n_cells`` lowest-``id_col`` vectors
    (deterministic). Empty cells keep their previous centroid.
    Returns unit-normalized centroids (cosine quantizer).

    Determinism caveat: per-dimension float sums depend on partition
    order; assignments of near-tie vectors can differ across runs by
    the last ulp (same caveat as any distributed mean). The seeded
    quantizer above is the bit-reproducible path."""
    sample = df.orderBy(id_col).limit(n_cells).select(_as_double(vec_col)).collect()
    cents = np.array([r[0] for r in sample], dtype=float)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = df.select(_as_double(vec_col).alias("v")).persist()
    for _ in range(n_iter):
        assigned = vecs.withColumn("cell", ivf_cell_col("v", cents))
        stats = (
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for r in stats:
            sums[r["cell"], r["i"]] = r["s"]
            counts[r["cell"]] = r["n"]
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = new / norms
    vecs.unpersist()
    return cents


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroids: np.ndarray | None = None,
    n_cells: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: (query_id, neighbor_id, rank, sim).
    Corpus vectors live in their nearest-centroid cell; each query
    scores only its ``nprobe`` nearest cells — a plain cell-keyed
    equi-join, so corpus skew maps to cell sizes (bounded by the
    quantizer), never to a hot query. Pass trained ``centroids`` from
    kmeans_centroids, or omit for the seeded quantizer. Probed cells
    are disjoint, so no candidate dedup is needed (contrast
    multi-probe LSH). Recall < 1 by construction; cosine_topk is the
    exact oracle it is measured against."""
    dim = len(corpus.select(vec_col).first()[0])
    if centroids is None:
        centroids = seeded_centroids(dim, n_cells, seed)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        F.col("_norm").alias("cn"),
        ivf_cell_col(vec_col, centroids).alias("cell"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        F.col("_norm").alias("qn"),
        F.explode(_probe_cells_col(vec_col, centroids, nprobe)).alias("cell"),
    )
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        c.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (dot / (F.col("qn") * F.col("cn"))).alias("sim"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a, b, sim ≥ threshold) within
    LSH buckets — the all-pairs variant of ann_cosine_topk.
    ``exact=True`` skips bucketing (full O(n²) pair scan): the oracle
    path and the right call below ~10^5 rows."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    v = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        F.col("_norm").alias("n"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    )
    a = v.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"), "bucket")
    b = v.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "bucket")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda ac, x: ac + x)
    joined = (
        a.drop("bucket").crossJoin(b.drop("bucket")) if exact else a.join(b, "bucket")
    )
    return (
        joined.filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(dot / (F.col("na") * F.col("nb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    centroids: np.ndarray | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public paper): semantic
    deduplication over an embedding column — cluster the space with a
    coarse quantizer, compare pairs ONLY within a cluster, connect
    pairs with cosine ≥ threshold into duplicate groups, and keep one
    representative per group: the member LEAST similar to its cluster
    centroid (the paper's diversity-preserving rule), ties by smallest
    id. Returns one row per vector:
    DataFrame(id, cell, cluster, centroid_sim, keep).

    Scale shape: cell assignment is pure column math against baked-in
    centroid constants (zero shuffles); the pair scan is an equi-join
    keyed by cell, so cost is Σ|cell|² /2 — the quantizer's job is
    to keep cells balanced (pass trained ``kmeans_centroids`` for
    that; the seeded default is the oracle-replayable path). Duplicate
    groups close transitively through the engine's distributed WCC
    (min-label component id = cluster id), exactly like the MinHash
    ``dedup_clusters`` path — SemDeDup is its embedding-space sibling.
    ``centroid_sim`` is rounded to 9 (and pair sims to 6) so survivor
    selection replays exactly in SQL despite sum-order drift.
    """
    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import weakly_connected_components

    dim = len(df.select(vec_col).first()[0])
    if centroids is None:
        centroids = seeded_centroids(dim, n_cells, seed)
    sims = _cell_sims_col(vec_col, centroids)
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                F.element_at(sims, i + 1).alias("s"), (-i).alias("negc")
            ),
        )
    )
    v = with_norm(df, vec_col).select(
        F.col(id_col).cast("long").alias("id"),
        _as_double(vec_col).alias("v"),
        F.col("_norm").alias("n"),
        (-best["negc"]).cast("int").alias("cell"),
        F.round(best["s"] / F.col("_norm"), 9).alias("csim"),
    )
    a = v.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"), "cell"
    )
    b = v.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "cell"
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda ac, x: ac + x
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(dot / (F.col("na") * F.col("nb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    )
    wcc = weakly_connected_components(LinkGraph(edges, directed=False)).state
    labeled = v.select("id", "cell", "csim").join(
        wcc.withColumnRenamed("id", "_wid"), v.id == F.col("_wid"), "left"
    ).select(
        "id", "cell", "csim", F.coalesce("component", "id").alias("cluster")
    )
    survivors = labeled.groupBy("cluster").agg(
        F.expr("min_by(id, struct(csim, id))").alias("_keep_id")
    )
    return (
        labeled.join(survivors, "cluster")
        .select(
            "id",
            "cell",
            "cluster",
            F.col("csim").alias("centroid_sim"),
            (F.col("id") == F.col("_keep_id")).alias("keep"),
        )
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    nbr_col: str = "neighbor_id",
) -> DataFrame:
    """ANN evaluation: DataFrame(query_id, k_exact, hits, recall) —
    per-query recall of an approximate top-k result against the exact
    one (|approx ∩ exact| / |exact|). The measure-don't-guess step
    every ANN deployment needs before trading exactness for the
    bucketed plan: run both on a sampled query set, aggregate recall,
    then ship the approximate plan with a number attached. Two
    distincts + one semi-join keyed on (query, neighbor), one groupBy.
    """
    a = approx.select(
        F.col(query_col).alias("query_id"), F.col(nbr_col).alias("neighbor_id")
    ).distinct()
    e = exact.select(
        F.col(query_col).alias("query_id"), F.col(nbr_col).alias("neighbor_id")
    ).distinct()
    ke = e.groupBy("query_id").agg(F.count("*").alias("k_exact"))
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        ke.join(hits, "query_id", "left")
        .select(
            "query_id",
            "k_exact",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            (F.coalesce("hits", F.lit(0)) / F.col("k_exact")).alias("recall"),
        )
    )


# --- product quantization (Jégou, Douze & Schmid, TPAMI 2011) ---------------


def seeded_pq_codebooks(
    dim: int, m: int = 4, k: int = 8, seed: int = 11
) -> np.ndarray:
    """Data-independent PQ codebooks, shape (m, k, dim/m): seeded
    normal subvector centroids. Reproducible as SQL constants, so PQ
    encode + ADC search are oracle-checkable end-to-end (the trained
    path, ``pq_train``, is pytest-verified instead)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.RandomState(seed)
    return rng.normal(size=(m, k, dim // m))


def _subvec(vec_col: str, s: int, dsub: int):
    return F.slice(_as_double(vec_col), s * dsub + 1, dsub)


def _sub_dists_col(vec_col: str, s: int, book: np.ndarray):
    """Array of squared L2 distances from subvector s to each of the
    k centroids of its codebook — pure column math."""
    dsub = book.shape[1]
    sub = _subvec(vec_col, s, dsub)
    cols = []
    for c in book:
        cent = F.array(*[F.lit(float(x)) for x in c])
        cols.append(
            F.aggregate(
                F.zip_with(sub, cent, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    return F.array(*cols)


def _argmin_code(dists, k: int):
    """Index of the smallest entry, ties to the lowest code."""
    best = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.struct(F.element_at(dists, i + 1).alias("d"), i.alias("c")),
        )
    )
    return best["c"].cast("int")


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame(id_col, codes array<int>): each vector compressed to
    m codebook indices (nearest centroid per subspace, squared-L2,
    ties to the lowest code). The 10^12-scale representation: a
    64-dim float vector becomes m bytes; everything is JVM column
    math fused into the scan."""
    m, k, _ = codebooks.shape
    codes = F.array(
        *[
            _argmin_code(_sub_dists_col(vec_col, s, codebooks[s]), k)
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Train PQ codebooks with per-subspace distributed Lloyd's:
    assignment is the baked-literal nearest-centroid expression (one
    pass over the exploded (id, sub, subvec) rows, all m subspaces at
    once), update is a (sub, code)-keyed mean of subvector components
    (map-side combined; m·k result rows collect to the driver — the
    model is small, the data never moves). Empty clusters keep their
    previous centroid. Deterministic: seeded init, argmin ties to the
    lowest code."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    dim = len(first[0])
    dsub = dim // m
    books = seeded_pq_codebooks(dim, m, k, seed)
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"), _subvec(vec_col, s, dsub).alias("v")
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("id", "e.s", "e.v").persist()
    ex.count()
    for _ in range(n_iter):
        # when-chain so subspace s uses ITS codebook in the argmin
        expr = None
        for s in range(m):
            dists = F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            F.array(*[F.lit(float(x)) for x in books[s][c]]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    for c in range(k)
                ]
            )
            this = _argmin_code(dists, k)
            expr = this if expr is None else F.when(F.col("s") == F.lit(s), this).otherwise(expr)
        assigned = ex.select("s", F.col("v"), expr.alias("c"))
        means = (
            assigned.groupBy("s", "c")
            .agg(*[F.avg(F.element_at("v", j + 1)).alias(f"x{j}") for j in range(dsub)])
            .collect()
        )
        for r in means:
            books[r["s"]][r["c"]] = [r[f"x{j}"] for j in range(dsub)]
    ex.unpersist()
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    codebooks: np.ndarray | None = None,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """PQ asymmetric-distance top-k: (query_id, neighbor_id, rank,
    adist). The corpus lives as m-byte codes; each query precomputes
    its m×k lookup table of subspace distances ONCE (column math on
    the query row), and every candidate's approximate distance is m
    table lookups — the ADC scan of Jégou et al. Ranking uses the
    6-dp-rounded distance (ascending, ties to the lowest neighbor
    id), so the top-k set is deterministic across engines.

    Scale shape: the code table is the scan operand (25× smaller than
    the raw vectors at 64-dim float → 4 codes); queries broadcast
    with their LUTs; at 10^12 vectors compose with the IVF cells
    (ivf_cosine_topk) so only probed cells are ADC-scanned. Pass
    trained ``codebooks`` from pq_train, or omit for the seeded
    quantizer (the oracle path)."""
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("pq_topk: empty corpus")
    dim = len(first[0])
    if codebooks is None:
        codebooks = seeded_pq_codebooks(dim, m, n_codes, seed)
    mm, kk, _ = codebooks.shape
    codes = pq_encode(corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    lut = F.array(
        *[_sub_dists_col(vec_col, s, codebooks[s]) for s in range(mm)]
    )
    q = queries.select(F.col(id_col).alias("query_id"), lut.alias("lut"))
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(mm - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.get(F.get(F.col("lut"), s), F.get(F.col("codes"), s)),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(adist, 6).alias("adist"))
    )
    win = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )
