"""BPE training: exact merge-sequence equality vs a pure-Python
replay of Sennrich's learn_bpe loop (same tie-break), plus encoding
round-trip properties."""

import collections

import pytest

from linkgraph.functions.text import TOKEN_PATTERN
from linkgraph.operators.tokenizer import (
    END_OF_WORD,
    bpe_encode,
    bpe_merges,
    word_counts,
)

DOCS = [
    "the lower the lowest newer newest",
    "low low low lower lowest new newer",
    "widest wide wider new newest the",
    "the the the low lowest wide widest",
]


def _py_word_counts(texts):
    import re

    counts = collections.Counter()
    for t in texts:
        counts.update(m.group(1) for m in re.finditer(TOKEN_PATTERN, t.lower()))
    return counts


def _py_bpe(counts, n_merges, min_count=1):
    """Reference-faithful Sennrich learn_bpe: overlapping pair stats,
    argmax with (count DESC, pair ASC) tie-break, left-to-right
    non-overlapping replacement."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + END_OF_WORD]): c
        for w, c in counts.items()
        if c >= min_count and w
    }
    rules = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        rules.append((l, r, n))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return rules


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )


def test_word_counts_match_python(spark, docs_df):
    got = {r.word: r["count"] for r in word_counts(docs_df).collect()}
    assert got == dict(_py_word_counts(DOCS))


@pytest.mark.parametrize("k", [2, 12])
def test_merge_sequence_exactly_matches_reference_replay(spark, docs_df, k):
    vocab = word_counts(docs_df)
    got = bpe_merges(vocab, n_merges=k)
    want = _py_bpe(_py_word_counts(DOCS), k)
    assert got == want


def test_min_count_floor(spark, docs_df):
    vocab = word_counts(docs_df)
    got = bpe_merges(vocab, n_merges=4, min_count=3)
    want = _py_bpe(_py_word_counts(DOCS), 4, min_count=3)
    assert got == want


def test_training_exhausts_cleanly(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    rules = bpe_merges(word_counts(df), n_merges=50)
    # 'ab' (corpus count 2) has one pair (a, b</w>) then becomes a
    # single symbol — training stops after 1 rule despite n_merges=50
    assert rules == [("a", "b" + END_OF_WORD, 2)]
    with pytest.raises(ValueError):
        bpe_merges(word_counts(df), n_merges=-1)


def test_encode_applies_rules_and_preserves_text(spark, docs_df):
    vocab = word_counts(docs_df)
    rules = bpe_merges(vocab, n_merges=6)
    enc = bpe_encode(docs_df, rules).collect()
    py_counts = _py_word_counts(DOCS)
    for row in enc:
        toks = row.bpe_tokens
        # symbols concatenated reproduce the tokenized text exactly
        flat = "".join(toks).replace(END_OF_WORD, " ").split()
        import re

        want = [m.group(1) for m in re.finditer(TOKEN_PATTERN, row.text.lower())]
        assert flat == want
        # every end-of-word boundary survives: one marker per word
        assert "".join(toks).count(END_OF_WORD) == len(want)


def test_checkpoint_resume_matches_uninterrupted(spark, docs_df, tmp_path):
    vocab = word_counts(docs_df)
    want = bpe_merges(vocab, n_merges=8)
    ck = str(tmp_path / "bpe_ck")
    # "crash" after round 4 (committed at every 2nd round)...
    partial = bpe_merges(vocab, n_merges=4, checkpoint_dir=ck, checkpoint_every=2)
    assert partial == want[:4]
    # ...then a fresh call with the same dir resumes at round 4
    resumed = bpe_merges(vocab, n_merges=8, checkpoint_dir=ck, checkpoint_every=2)
    assert resumed == want


def test_encode_with_zero_rules_is_characters(spark):
    df = spark.createDataFrame([(0, "hi")], "doc_id long, text string")
    toks = bpe_encode(df, []).collect()[0].bpe_tokens
    assert toks == ["h", "i" + END_OF_WORD]


def _seq_apply(word, rules):
    """Sequential rule application — the semantics the expression
    fold implements, as the oracle for the scale path."""
    sym = list(word[:-1]) + [word[-1] + END_OF_WORD]
    present = set(sym)
    for l, r in rules:
        if l not in present or r not in present:
            continue
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        if len(out) != len(sym):
            sym = out
            present = set(sym)
    return sym


def _chain_rules(words):
    """A topologically-valid merge-rule list that fully fuses each
    word left-to-right (shared prefixes dedup) — the cheap way to a
    5k+-rule tokenizer without 5k training rounds."""
    rules, seen = [], set()
    for w in words:
        sym = list(w[:-1]) + [w[-1] + END_OF_WORD]
        acc = sym[0]
        for nxt in sym[1:]:
            pair = (acc, nxt)
            if pair not in seen:
                seen.add(pair)
                rules.append(pair)
            acc = acc + nxt
    return rules


def test_encode_scale_path_matches_sequential_replay(spark):
    """5k+ merge rules: the expression fold cannot plan this (a
    |rules|-deep Catalyst tree); the mapInPandas greedy encoder must
    equal the sequential-application oracle exactly."""
    import random

    rng = random.Random(5)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 14)))
            for _ in range(900)
        }
    )
    rules = _chain_rules(words)
    assert len(rules) > 5000
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(12))) for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, rules).collect()}
    for doc_id, text in docs:
        want = [s for w in text.split() for s in _seq_apply(w, rules)]
        assert got[doc_id] == want, doc_id
        # merges actually bit: far fewer symbols than characters
        assert len(got[doc_id]) < sum(len(w) for w in text.split())


def test_encode_expression_and_pandas_plans_agree(spark, docs_df):
    """Plan parity: the same rule list through the expression fold
    and through the forced mapInPandas path yields identical rows."""
    rules = bpe_merges(word_counts(docs_df), n_merges=10)
    a = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs_df, rules).collect()}
    b = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(docs_df, rules, expr_rules_max=0).collect()
    }
    assert a == b
    # null text survives both plans
    nul = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert bpe_encode(nul, rules, expr_rules_max=0).collect()[0].bpe_tokens is None
    assert bpe_encode(nul, rules).collect()[0].bpe_tokens is None
