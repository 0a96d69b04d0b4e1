import itertools

from linkgraph.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_duplicates,
    shingles,
)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again every single day"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different content about spark shuffles and partitions at scale"),
        (5, "Another unrelated document mentioning graphs pagerank and components"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _true_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = [w.lower() for w in t.split()]
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(spark):
    out = exact_duplicates(_corpus(spark), "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = {r["shingle"] for r in shingles(df, "doc_id", "text", 3).collect()}
    assert got == {"a b c", "b c d"}


def test_minhash_identical_docs_agree(spark):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(_corpus(spark), "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_estimates_jaccard(spark):
    docs = {r["doc_id"]: r["text"] for r in _corpus(spark).collect()}
    sigs = {r["id"]: r["sig"] for r in
            minhash_signatures(_corpus(spark), "doc_id", "text", n_hashes=64).collect()}
    for a, b in itertools.combinations(sorted(docs), 2):
        true_j = _true_jaccard(docs[a], docs[b])
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 64
        assert abs(est - true_j) < 0.25, (a, b, est, true_j)


def test_lsh_pipeline_finds_near_dups(spark):
    out = minhash_near_duplicates(_corpus(spark), "doc_id", "text", threshold=0.5)
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    assert (1, 2) in pairs  # exact dup must always survive
    assert all(p[0] < p[1] for p in pairs)


def test_lsh_candidates_no_false_self_pairs(spark):
    sigs = minhash_signatures(_corpus(spark), "doc_id", "text")
    cands = lsh_candidate_pairs(sigs, bands=8).collect()
    assert all(r["a"] < r["b"] for r in cands)


def test_ngram_jaccard_exact(spark):
    docs = {r["doc_id"]: r["text"] for r in _corpus(spark).collect()}
    out = ngram_jaccard_pairs(_corpus(spark), "doc_id", "text", k=3, threshold=0.0)
    got = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    assert abs(got[(1, 2)] - 1.0) < 1e-9
    assert abs(got[(1, 3)] - _true_jaccard(docs[1], docs[3])) < 1e-6
    assert (1, 4) not in got or got[(1, 4)] < 0.1


def test_simhash_duplicates(spark):
    out = simhash_duplicates(_corpus(spark), "doc_id", "text").collect()
    groups = {r["keep_id"]: r["n_docs"] for r in out}
    assert groups.get(1, 0) >= 2  # docs 1 & 2 share the bucket


def test_ngram_jaccard_candidates_restriction(spark):
    """candidates= scores exactly the given pairs: equal to the
    all-pairs result restricted to that pair set."""
    df = _corpus(spark)
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()}
    cand = spark.createDataFrame([(1, 2), (1, 3), (4, 5)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(
               df, "doc_id", "text", threshold=0.0, candidates=cand).collect()}
    # (4,5) shares no shingle: no common row, absent from both
    assert set(got) == {(1, 2), (1, 3)}
    for p, j in got.items():
        assert j == full[p]


def test_dedup_clusters_chained(spark):
    """A≈B≈C chains into one cluster with min-id survivor even if
    A and C alone wouldn't pass the threshold; unique docs keep
    themselves."""
    from linkgraph.operators.dedup import dedup_clusters

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (10, base),
        (11, base.replace("delta", "DELTA1").replace("kappa", "KAPPA1")),
        (12, base.replace("delta", "DELTA1").replace("kappa", "KAPPA1")
                 .replace("sigma", "SIGMA2").replace("pi", "PI2")),
        (13, "totally unrelated text about distributed shuffles and joins "
             "with many extra words to make enough shingles for hashing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
           for r in dedup_clusters(df, threshold=0.3).collect()}
    assert out[10] == (10, False)
    assert out[11] == (10, True)
    assert out[12] == (10, True)
    assert out[13] == (13, False)
    assert len(out) == 4


def test_dedup_clusters_no_dups(spark):
    """No verified pairs: every doc is its own canonical."""
    from linkgraph.operators.dedup import dedup_clusters

    rows = [(i, f"document {i} " + " ".join(f"tok{i}x{j}" for j in range(20)))
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_clusters(df, threshold=0.9).collect()
    assert all(r["canonical_id"] == r["doc_id"] and not r["is_duplicate"] for r in out)
    assert len(out) == 5


def test_shingles_short_docs_yield_no_rows(spark):
    """Docs under k tokens must contribute zero shingles, not crash
    (sequence(1, n-k+1) descends through slice(…, 0, …) unguarded)."""
    from linkgraph.operators.dedup import shingles

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta"), (3, ""), (4, "one")],
        "doc_id long, text string",
    )
    got = shingles(df, "doc_id", "text", k=3).collect()
    assert {r["id"] for r in got} == {1}
    assert len(got) == 2  # 4 tokens → 2 distinct trigrams


def test_contamination_vs_python_oracle(spark):
    """Per-doc 5-gram overlap vs a pure-Python set computation,
    including a sub-k doc (0 grams) and a fully-clean doc."""
    import re

    from linkgraph.operators.dedup import contamination

    train = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words appear here nothing shared at all ok"),
        (3, "tiny doc"),
        (4, "the quick brown fox jumps over a sleepy cat instead"),
    ]
    bench = [(100, "we note the quick brown fox jumps over the lazy dog and more")]
    docs = spark.createDataFrame(train, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["id"]: r for r in contamination(docs, b, k=5, threshold=0.2).collect()}

    def grams(t, k=5):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    bg = set().union(*[grams(t) for _, t in bench])
    assert set(got) == {i for i, _ in train}
    for i, t in train:
        g = grams(t)
        r = got[i]
        assert (r["n_ngrams"], r["contaminated_ngrams"]) == (len(g), len(g & bg))
        exp = len(g & bg) / len(g) if g else 0.0
        assert abs(r["contamination"] - exp) < 1e-12
        assert r["flagged"] == (exp >= 0.2)


def test_contamination_no_broadcast_same_result(spark):
    """broadcast_benchmark=False (large-eval shuffle path) is
    value-identical to the broadcast plan."""
    from linkgraph.operators.dedup import contamination

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(12))) for i in range(20)
    ]
    docs = spark.createDataFrame(rows[:15], "doc_id long, text string")
    bench = spark.createDataFrame(rows[15:], "doc_id long, text string")
    a = sorted(map(tuple, contamination(docs, bench, k=3).collect()))
    b = sorted(
        map(tuple, contamination(docs, bench, k=3, broadcast_benchmark=False).collect())
    )
    assert a == b and len(a) == 15


def test_duplicated_ngram_stats(spark):
    from linkgraph.operators.dedup import duplicated_ngram_stats

    docs = [
        (1, "a b c d e f"),        # shares 'a b c' with doc 2
        (2, "a b c x y"),
        (3, "q r s t u"),          # unique
        (4, "too short"),          # < k tokens
        (5, "a b c d e f"),        # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: (r["n_ngrams"], r["dup_ngrams"], r["dup_frac"])
           for r in duplicated_ngram_stats(df, k=3).collect()}
    # brute force
    import itertools
    grams = {}
    for i, t in docs:
        toks = t.split()
        gs = {" ".join(toks[j:j+3]) for j in range(len(toks) - 2)}
        grams[i] = gs
    for i, t in docs:
        n = len(grams[i])
        dup = sum(
            1 for g in grams[i]
            if any(g in grams[j] for j, _ in docs if j != i)
        )
        want = (n, dup, dup / n if n else 0.0)
        assert got[i] == want, (i, got[i], want)


def test_winnowing_matches_python_replica(spark):
    from linkgraph.operators.dedup import winnowing_fingerprints
    import hashlib, re

    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replica(text, k, w):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < k:
            return set()
        hs = [md5int(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
        m = len(hs)
        out = set()
        n_windows = max(m - w + 1, 1)
        for s in range(n_windows):
            win = hs[s:s + w]
            mh = min(win)
            # rightmost min
            pos = max(i for i, h in enumerate(win, start=s) if h == mh)
            out.add((mh, pos))
        return out

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog"),  # shared prefix
        (3, "a b c d e"),            # exactly one gram (m=1 < window)
        (4, "one two three four five six"),  # m=2 < window
        (5, "too short"),            # no grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r["id"], set()).add((r["fp"], r["pos"]))
    for i, t in docs:
        assert got.get(i, set()) == replica(t, 5, 4), i
    # the guarantee: docs 1 and 2 share a long match -> shared fingerprint
    shared = {f for f, _ in got[1]} & {f for f, _ in got[2]}
    assert shared


def test_remove_duplicated_spans(spark):
    from linkgraph.operators.dedup import remove_duplicated_spans

    docs = [
        (1, "a b c d e f g h i j k l m"),
        (2, "a b c d e f g h x y z"),          # shares the a..h 8-gram with 1
        (3, "totally unique words here nothing shared at all ok"),
        (4, "short doc"),                        # < k tokens: untouched
        (5, "p p p p p p p p p p"),              # within-doc repeat only: kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in remove_duplicated_spans(df, k=8).collect()}
    assert got[1] == (13, 8, "i j k l m")
    assert got[2] == (11, 8, "x y z")
    assert got[3][1] == 0 and got[3][2].startswith("totally unique")
    assert got[4] == (2, 0, "short doc")
    # duplication must be CROSS-document: a doc repeating its own gram
    # keeps it
    assert got[5][1] == 0


def test_simhash_hamming_pairs_vs_python_replica(spark):
    """Manku block-join result == brute-force all-pairs Hamming ball
    over a pure-Python SimHash replica, at an exact-width split
    (48/4) and a remainder split (50 → widths 13,13,12,12)."""
    import hashlib
    import itertools
    import re

    from linkgraph.operators.dedup import simhash_hamming_pairs

    base = "the quick brown fox jumps over the lazy dog again and again every single day"
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("lazy", "sleepy")),
        (4, base.replace("quick", "slow").replace("dog", "cat")),
        (5, "completely different content about spark shuffles and partitions at scale"),
        (6, "another unrelated document mentioning graphs pagerank and components"),
        (7, base + " with a small suffix appended"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_simhash(text, bits):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        hs = [md5int(t) for t in toks]
        acc = 0
        for i in range(bits):
            if 2 * sum(1 for h in hs if h & (1 << i)) > len(hs):
                acc |= 1 << i
        return acc

    for bits, k in [(48, 3), (50, 3), (16, 4)]:
        want = set()
        sh = {i: py_simhash(t, bits) for i, t in rows}
        for a, b in itertools.combinations(sorted(sh), 2):
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= k:
                want.add((a, b, d))
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_hamming_pairs(df, "doc_id", "text", bits=bits, k=k).collect()
        }
        assert got == want, (bits, k, got, want)
        assert any(p[0] == 1 and p[1] == 2 and p[2] == 0 for p in want)  # exact dup present


def test_simhash_hamming_pairs_rejects_bad_width():
    import pytest as _pytest

    from linkgraph.operators.dedup import simhash_hamming_pairs

    with _pytest.raises(ValueError):
        simhash_hamming_pairs(None, "doc_id", "text", bits=64, k=3)
    with _pytest.raises(ValueError):
        simhash_hamming_pairs(None, "doc_id", "text", bits=3, k=3)


def test_host_boilerplate_detect_and_remove(spark):
    """Host-scoped template grams flagged (and removed) exactly per a
    pure-Python replica; cross-host identical text is NOT flagged when
    the host's doc_frac stays under threshold."""
    import itertools
    import re

    from linkgraph.operators.dedup import host_boilerplate, remove_host_boilerplate

    nav = "home about contact terms of service privacy policy"
    rows = [
        # host a: 4 docs sharing the nav template + distinct bodies
        ("a", 1, nav + " welcome to our store selling garden tools"),
        ("a", 2, nav + " our story began in a small workshop"),
        ("a", 3, nav + " todays deals include rakes and shovels"),
        ("a", 4, "a page without the template at all here now"),
        # host b: the SAME nav text once — under b's threshold
        ("b", 5, nav + " completely different host content"),
        ("b", 6, "nothing shared with anything else whatsoever"),
        ("b", 7, "more unique prose that repeats nowhere else"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    k, min_docs, min_frac = 5, 2, 0.5

    def toks(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    def grams(t):
        tt = toks(t)
        return {
            (i, " ".join(tt[i : i + k])) for i in range(len(tt) - k + 1)
        } if len(tt) >= k else set()

    by_host = {}
    for h, i, t in rows:
        by_host.setdefault(h, []).append((i, t))
    want_flags = set()
    for h, docs in by_host.items():
        cnt = {}
        for i, t in docs:
            for g in {g for _, g in grams(t)}:
                cnt[g] = cnt.get(g, 0) + 1
        for g, n in cnt.items():
            frac = round(n / len(docs), 6)
            if n >= min_docs and frac >= min_frac:
                want_flags.add((h, g, n, frac))
    got_flags = {
        (r["host"], r["gram"], r["n_docs"], r["doc_frac"])
        for r in host_boilerplate(df, k=k, min_docs=min_docs, min_frac=min_frac).collect()
    }
    assert got_flags == want_flags
    assert any(h == "a" for h, *_ in got_flags)
    assert not any(h == "b" for h, *_ in got_flags)  # 1/3 < 0.5

    flagged_by_host = {}
    for h, g, _, _ in want_flags:
        flagged_by_host.setdefault(h, set()).add(g)
    want_clean = {}
    for h, i, t in rows:
        tt = toks(t)
        covered = set()
        for s, g in grams(t):
            if g in flagged_by_host.get(h, set()):
                covered.update(range(s, s + k))
        keep = [w for j, w in enumerate(tt) if j not in covered]
        want_clean[i] = (len(tt), len(tt) - len(keep), " ".join(keep))
    got_clean = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_host_boilerplate(df, k=k, min_docs=min_docs, min_frac=min_frac).collect()
    }
    assert got_clean == want_clean
    assert got_clean[1][1] > 0 and got_clean[4][1] == 0


# --- segment-level (line) corpus dedup -----------------------------------


def _py_segment_dedup(docs, sep, min_count, min_chars):
    segs = {i: t.split(sep) for i, t in docs}
    from collections import defaultdict

    docs_per_seg = defaultdict(set)
    for i, ss in segs.items():
        for s in ss:
            if len(s.strip()) >= min_chars:
                docs_per_seg[s].add(i)
    dup = {s for s, ds in docs_per_seg.items() if len(ds) >= min_count}
    out = {}
    for i, ss in segs.items():
        kept = [s for s in ss if not (s in dup and len(s.strip()) >= min_chars)]
        out[i] = (len(ss), len(ss) - len(kept), sep.join(kept))
    return out


def test_segment_dedup_replica(spark):
    from linkgraph.operators.dedup import segment_dedup

    docs = [
        (1, "unique alpha line\ncookie banner accept all\nmore text here"),
        (2, "cookie banner accept all\nsecond doc body line"),
        (3, "third doc only line\ncookie banner accept all\nx\nx"),
        (4, "x\nshort dup\nshort dup"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_segments"], r["n_removed"], r["clean_text"])
        for r in segment_dedup(df, sep="\n", min_count=2, min_chars=3).collect()
    }
    want = _py_segment_dedup(docs, "\n", 2, 3)
    assert got == want
    # the shared banner is removed everywhere, 1-char 'x' never is
    assert "cookie banner" not in got[1][2]
    assert got[3][2].count("x") == 2
    # within-doc repetition alone ("short dup" twice in doc 4 only)
    # does NOT trigger removal — the rule counts DISTINCT documents
    assert got[4][1] == 0


def test_segment_dedup_min_count_and_empty(spark):
    from linkgraph.operators.dedup import segment_dedup

    docs = [
        (1, "shared across two docs"),
        (2, "shared across two docs"),
        (3, "unrelated content entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    at2 = {
        r["id"]: r["clean_text"]
        for r in segment_dedup(df, min_count=2, min_chars=3).collect()
    }
    assert at2[1] == "" and at2[2] == "" and at2[3] != ""
    at3 = {
        r["id"]: r["clean_text"]
        for r in segment_dedup(df, min_count=3, min_chars=3).collect()
    }
    assert at3[1] == "shared across two docs"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_count"):
        segment_dedup(df, min_count=1)
