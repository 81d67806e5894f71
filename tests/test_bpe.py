"""BPE tokenizer: hand-computed merge table, encoder equivalence with
an independent sequential-replay implementation, and the distributed
segment pass against a local recompute."""

from __future__ import annotations

import numpy as np

from webalizer_spark.operators.bpe import (
    _EOW,
    bpe_segment,
    bpe_train_sample,
    encode_word,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def test_train_bpe_known_merges():
    """The classic subword-nmt example: 'low'x3 + 'lower'x2 + 'newest'.
    Pair counts give (l,o)=(o,w)=5 first (lexicographic tie-break picks
    (l,o)), then (lo,w)=5, then (low,</w>)=3, then the count-2 tie
    (e,r) < (low,e) < (r,</w>) lexicographically."""
    texts = ["low low low", "lower lower", "newest"]
    merges = train_bpe(texts, 4)
    assert merges == [("l", "o"), ("lo", "w"), ("low", _EOW), ("e", "r")]
    # early stop: no pair reaches count 2 on a tiny all-distinct corpus
    assert train_bpe(["ab", "cd"], 100) == []


def test_encode_word_known_segmentation():
    texts = ["low low low", "lower lower", "newest"]
    ranks = {p: i for i, p in enumerate(train_bpe(texts, 4))}
    assert encode_word("low", ranks) == ["low" + _EOW]
    assert encode_word("lowest", ranks) == ["low", "e", "s", "t", _EOW]
    assert encode_word("er", ranks) == ["er", _EOW]


def _encode_sequential(word: str, merges: list) -> list:
    """Independent reference encoder: apply merges in TRAINING order,
    each swept repeatedly over the whole symbol list — a different
    algorithm from encode_word's rank-greedy replay; for BPE the two
    are equivalent."""
    sym = list(word) + [_EOW]
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i:i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_encoder_equivalence_random_words():
    rng = np.random.default_rng(5)
    corpus = [" ".join("".join(rng.choice(list("abcdef"),
                                          rng.integers(1, 9)))
                       for _ in range(30)) for _ in range(20)]
    merges = train_bpe(corpus, 40)
    assert len(merges) > 10
    ranks = {p: i for i, p in enumerate(merges)}
    for _ in range(200):
        w = "".join(rng.choice(list("abcdefgh"), rng.integers(1, 12)))
        assert encode_word(w, ranks) == _encode_sequential(w, merges), w


def test_bpe_segment_matches_local(spark):
    """The distributed segment pass agrees with a local per-doc
    recompute, and training is deterministic run-to-run."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train_sample(docs, n_merges=64, sample_size=256)
    assert merges == bpe_train_sample(docs, n_merges=64, sample_size=256)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows[:40]:
        words = (r["text"] or "").split()
        ntok = sum(len(encode_word(w, ranks)) for w in words)
        g = got[r["doc_id"]]
        assert g["n_words"] == len(words)
        assert g["n_bpe_tokens"] == ntok, r["doc_id"]
        assert g["n_bpe_tokens"] >= g["n_words"]     # >= 1 token per word
