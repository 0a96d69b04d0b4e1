"""Distributed seeded random-graph generator (G(n, m)-style).

The reference's benchmark harness builds seeded random graphs on the
driver (benchmarks/src/benchmark_networkx.py:115-162 and the Rust
side's StdRng rebuild, benchmark_networkx_rs.rs:206-254) — a shape
that cannot produce a 10^9-edge input. This generator is
coordination-free like sources/pages.py: each edge row is a pure
hash function of its index, so any partition of
``spark.range(m)`` produces identical rows on every run at any
executor count — the property that lets the same benchmark graph be
materialized at cluster scale with zero driver involvement.

Skew realism: ``zipf_s > 0`` draws the source endpoint from a
Zipf-ish distribution over vertex ranks (hub-heavy, like web link
graphs); 0 gives uniform endpoints (the reference's gnm shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _mix64(x: Column) -> Column:
    """Full-range 64-bit mix of a long column. xxhash64 (JVM
    intrinsic) rather than hand-rolled splitmix: ANSI mode rejects
    the wrap-around multiplies splitmix needs, and the only required
    property here is a deterministic uniform mix."""
    return F.xxhash64(x)


def _u01(x: Column) -> Column:
    """Uniform [0,1) from a hashed long (low 32 bits)."""
    return (x.bitwiseAND(F.lit(0xFFFFFFFF))).cast("double") / F.lit(float(2**32))


def random_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    zipf_s: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """DataFrame(src, dst, weight): ``n_edges`` seeded random edges
    over vertex ids 0..n_vertices-1, weights uniform in [1, 2).
    Deterministic per (seed, index); self-loops re-targeted."""
    rng = spark.range(n_edges, numPartitions=partitions).select(
        F.col("id"), F.xxhash64(F.col("id"), F.lit(seed)).alias("h")
    )
    if zipf_s > 0:
        # inverse-CDF heavy-tail rank draw (exact normalization is
        # irrelevant for a benchmark input; determinism + skew shape
        # are what matter): s > 1 → Pareto(s-1) rank
        # r = floor((1-u)^(-1/(s-1))) - 1 (mass concentrated at rank
        # 0, power-law tail); s <= 1 → log-uniform rank
        # r = floor(n^u) - 1 (density ∝ 1/(r+1), the s≈1 shape)
        u = _u01(F.col("h"))
        if zipf_s > 1.0:
            x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / (zipf_s - 1.0)))
        else:
            x = F.pow(F.lit(float(n_vertices)), u)
        src = F.least(
            F.lit(n_vertices - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), (F.floor(x) - 1).cast("long")),
        )
    else:
        src = F.pmod(F.col("h"), F.lit(n_vertices)).cast("long")
    h2 = F.xxhash64(F.col("id"), F.lit(seed), F.lit(1))
    dst = F.pmod(h2, F.lit(n_vertices)).cast("long")
    w = F.lit(1.0) + _u01(F.xxhash64(F.col("id"), F.lit(seed), F.lit(2)))
    out = rng.select(
        src.alias("src"),
        F.when(dst == src, F.pmod(dst + 1, F.lit(n_vertices)).cast("long"))
        .otherwise(dst)
        .alias("dst"),
        w.alias("weight"),
    )
    return out
