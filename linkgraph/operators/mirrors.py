"""Mirror-host / structural-twin detection by out-neighborhood Jaccard.

The classic web-crawl mirror problem (Bharat-Broder): two hosts serving
the same site link to (nearly) the same set of targets, so the Jaccard
similarity of their distinct outlink sets is ~1. The same primitive is
structural-equivalence detection on any directed graph: vertices whose
out-neighbor sets nearly coincide.

Scale shape mirrors dedup.py's near-dup plan:

- LSH mode (the 100 TB path): MinHash the outlink set (parallel min
  aggregations over the exploded (host, dst) rows — one shuffle, map-
  side combined), band the signatures, and bucket-join on the BAND
  HASH — the candidate shuffle is keyed by band value, not host, so a
  host that everyone links to (google.com) never makes a hot
  partition. Candidates are then verified with EXACT intersection
  counts restricted to candidate pairs.
- exact mode (the labeled oracle mode): all-pairs intersection via a
  self-join on shared dst — O(Σ in-deg(dst)²) pair rows, fine for
  modest host counts, fatal on popular targets at crawl scale (which
  is exactly what LSH mode avoids).

Both modes end at the same exact-count verification, so LSH output is
a subset of exact output determined only by band recall; with enough
bands on near-identical sets the two coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import md5int_col
from linkgraph.operators.dedup import MERSENNE31, lsh_candidate_pairs, minhash_params


def outlink_sets(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    drop_self: bool = True,
) -> DataFrame:
    """Distinct (id, out) rows: each source's set of out-neighbors,
    one row per member. Self-links are dropped by default (a mirror
    pair's self-links never coincide, so they only depress Jaccard)."""
    e = edges.select(F.col(src_col).alias("id"), F.col(dst_col).alias("out"))
    if drop_self:
        e = e.filter(F.col("id") != F.col("out"))
    return e.distinct()


def outlink_minhash(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_hashes: int = 32,
    seed: int = 42,
    drop_self: bool = True,
) -> DataFrame:
    """(id, sig array<long>): MinHash signature of each source's
    distinct outlink set. Same one-explode one-groupBy shape as
    dedup.minhash_signatures, with outlink targets as the set
    elements instead of text shingles."""
    sets_ = outlink_sets(edges, src_col, dst_col, drop_self)
    h = (md5int_col(F.col("out").cast("string")) % MERSENNE31).alias("h")
    base = sets_.select("id", h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_params(n_hashes, seed))
    ]
    sig = base.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"mh{j}" for j in range(n_hashes)]).alias("sig"))


def mirror_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    threshold: float = 0.5,
    min_outlinks: int = 2,
    mode: str = "lsh",
    n_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    drop_self: bool = True,
) -> DataFrame:
    """(a, b, common, jaccard): source pairs (a < b) whose distinct
    outlink sets have exact Jaccard >= threshold, both sides having at
    least ``min_outlinks`` distinct outlinks (singleton outlink sets
    produce degenerate Jaccard-1 matches).

    ``mode='lsh'`` scores only MinHash-band candidates (sub-quadratic,
    the scale path); ``mode='exact'`` scores every pair sharing >= 1
    outlink (the labeled oracle mode). Verification is exact counting
    in both modes."""
    if mode not in ("lsh", "exact"):
        raise ValueError(f"mirror_pairs: unknown mode {mode!r}")
    sets_ = outlink_sets(edges, src_col, dst_col, drop_self).persist()
    sizes = sets_.groupBy("id").agg(F.count("*").alias("n")).filter(
        F.col("n") >= min_outlinks
    )
    a = sets_.select(F.col("id").alias("a"), "out")
    b = sets_.select(F.col("id").alias("b"), "out")
    if mode == "lsh":
        sigs = outlink_minhash(edges, src_col, dst_col, n_hashes, seed, drop_self)
        cands = lsh_candidate_pairs(sigs, bands)
        common = (
            cands.join(a, "a")
            .join(b, ["b", "out"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    else:
        common = (
            a.join(b, "out")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        common.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
