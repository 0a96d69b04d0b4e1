import itertools

from linkgraph.operators.mirrors import mirror_pairs, outlink_minhash, outlink_sets


def _brute_jaccard(edges, min_outlinks=2, drop_self=True):
    outs = {}
    for s, d in edges:
        if drop_self and s == d:
            continue
        outs.setdefault(s, set()).add(d)
    outs = {k: v for k, v in outs.items() if len(v) >= min_outlinks}
    res = {}
    for a, b in itertools.combinations(sorted(outs), 2):
        inter = len(outs[a] & outs[b])
        if inter:
            res[(a, b)] = (inter, inter / len(outs[a] | outs[b]))
    return res


HOSTS = [
    # m1/m2 are perfect mirrors; m3 is a near mirror (3 of 4 targets);
    # h has a disjoint outlink set; tiny has one outlink (filtered)
    ("m1", "t1"), ("m1", "t2"), ("m1", "t3"), ("m1", "t4"),
    ("m2", "t1"), ("m2", "t2"), ("m2", "t3"), ("m2", "t4"),
    ("m3", "t1"), ("m3", "t2"), ("m3", "t3"), ("m3", "t9"),
    ("h", "x1"), ("h", "x2"), ("h", "x3"),
    ("tiny", "t1"),
    ("self", "self"), ("self", "t1"), ("self", "t2"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_exact_mode_vs_brute_force(spark):
    df = _df(spark, HOSTS)
    got = {
        (r.a, r.b): (r.common, r.jaccard)
        for r in mirror_pairs(df, threshold=0.0, mode="exact").collect()
    }
    want = _brute_jaccard(HOSTS)
    assert set(got) == set(want)
    for k, (inter, j) in want.items():
        assert got[k][0] == inter
        assert abs(got[k][1] - j) < 1e-6


def test_perfect_mirror_found_by_lsh(spark):
    df = _df(spark, HOSTS)
    got = {
        (r.a, r.b): r.jaccard
        for r in mirror_pairs(df, threshold=0.6, mode="lsh").collect()
    }
    # identical outlink sets => identical signatures => same bands
    assert got[("m1", "m2")] == 1.0
    # the near mirror (jaccard 3/5 = 0.6) may or may not band-collide,
    # but nothing below threshold or disjoint may appear
    assert all(j >= 0.6 for j in got.values())
    assert not any("h" in pair or "tiny" in pair for pair in got)


def test_lsh_is_subset_of_exact(spark):
    df = _df(spark, HOSTS)
    exact = {(r.a, r.b) for r in mirror_pairs(df, threshold=0.1, mode="exact").collect()}
    lsh = {(r.a, r.b) for r in mirror_pairs(df, threshold=0.1, mode="lsh").collect()}
    assert lsh <= exact


def test_min_outlinks_and_self_links(spark):
    df = _df(spark, HOSTS)
    rows = mirror_pairs(df, threshold=0.0, mode="exact", min_outlinks=2).collect()
    ids = {r.a for r in rows} | {r.b for r in rows}
    assert "tiny" not in ids  # single outlink filtered
    # self-link dropped: "self" has outlinks {t1, t2}
    outs = {r.out for r in outlink_sets(df).filter("id = 'self'").collect()}
    assert outs == {"t1", "t2"}


def test_signature_deterministic(spark):
    df = _df(spark, HOSTS)
    s1 = sorted((r.id, tuple(r.sig)) for r in outlink_minhash(df).collect())
    s2 = sorted((r.id, tuple(r.sig)) for r in outlink_minhash(df).collect())
    assert s1 == s2
