"""Corpus-assembly operators: chunking, sequence packing, mixture
weights — hand-verified fixtures plus layout invariants (every token
lands in exactly one packed span, sequences are exactly `capacity`
full except the last, chunk reconstruction matches a pure-Python
replica)."""

from __future__ import annotations

import random

import pytest

from linkgraph.operators.packing import (
    chunk_documents,
    mixture_weights,
    pack_sequences,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"s{i % 3}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def _tok(t):
    import re

    return re.findall(r"[a-z0-9]+", t.lower())


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "delta", "x9", "foo", "bar", "qux"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    return _docs_df(spark, texts), texts


def test_chunks_match_python_replica(spark, corpus):
    df, texts = corpus
    got = {
        (r["doc_id"], r["chunk_no"]): (r["chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=7, stride=5).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = _tok(t)
        j = 0
        while j * 5 < len(toks):
            piece = toks[j * 5 : j * 5 + 7]
            want[(i, j)] = (len(piece), " ".join(piece))
            j += 1
    assert got == want


def test_chunks_nonoverlapping_default_cover_exactly(spark, corpus):
    df, texts = corpus
    rows = chunk_documents(df, chunk_tokens=10).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += r["chunk_tokens"]
    for i, t in enumerate(texts):
        n = len(_tok(t))
        assert per_doc.get(i, 0) == n


def test_pack_covers_every_token_exactly_once(spark, corpus):
    df, texts = corpus
    rows = pack_sequences(df, capacity=32).collect()
    total = sum(len(_tok(t)) for t in texts)
    covered = sum(r["doc_tok_end"] - r["doc_tok_start"] for r in rows)
    assert covered == total
    # per-document spans are contiguous and complete
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["seq_id"], r["doc_tok_start"], r["doc_tok_end"])
        )
    for i, t in enumerate(texts):
        n = len(_tok(t))
        spans = sorted(per_doc.get(i, []))
        if n == 0:
            assert spans == []
            continue
        assert spans[0][1] == 0 and spans[-1][2] == n
        for (s1, _, e1), (s2, b2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + 1 and b2 == e1
    # every sequence except the last holds exactly `capacity` tokens
    per_seq = {}
    for r in rows:
        per_seq.setdefault(r["seq_id"], 0)
        per_seq[r["seq_id"]] += r["doc_tok_end"] - r["doc_tok_start"]
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))
    for s, tok in per_seq.items():
        assert tok == 32 or (s == last and 0 < tok <= 32)
    # seq_off: within a sequence, spans tile [0, capacity)
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(
            (r["seq_off"], r["doc_tok_end"] - r["doc_tok_start"])
        )
    for s, pieces in by_seq.items():
        pieces.sort()
        pos = 0
        for off, ln in pieces:
            assert off == pos
            pos += ln


def test_pack_precomputed_count_column(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 9)], "doc_id long, n_tok long"
    )
    rows = pack_sequences(
        df, token_count_col_name="n_tok", capacity=4
    ).collect()
    got = sorted(
        (r["doc_id"], r["seq_id"], r["doc_tok_start"], r["doc_tok_end"], r["seq_off"])
        for r in rows
    )
    assert got == [
        (1, 0, 0, 4, 0),
        (1, 1, 4, 5, 0),
        (3, 1, 0, 3, 1),
        (3, 2, 3, 7, 0),
        (3, 3, 7, 9, 0),
    ]


def test_mixture_weights_temperature(spark, corpus):
    df, texts = corpus
    import math

    rows = mixture_weights(df, "source", alpha=0.5).collect()
    want_tokens = {}
    for i, t in enumerate(texts):
        want_tokens[f"s{i % 3}"] = want_tokens.get(f"s{i % 3}", 0) + len(_tok(t))
    raw = {g: math.pow(n, 0.5) for g, n in want_tokens.items()}
    tot = sum(raw.values())
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["n_tokens"] == want_tokens[r["group"]]
        assert abs(r["weight"] - raw[r["group"]] / tot) < 1e-12
    # alpha=1 is proportional sampling
    rows1 = mixture_weights(df, "source", alpha=1.0).collect()
    tot_tok = sum(want_tokens.values())
    for r in rows1:
        assert abs(r["weight"] - want_tokens[r["group"]] / tot_tok) < 1e-12


def test_validation_errors(spark, corpus):
    df, _ = corpus
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=5, stride=-1)
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=0)
