"""Byte-pair-encoding tokenizer: train on a bounded sample, apply
distributed — the tokenizer-fitting step of a training-data pipeline.

The production shape mirrors ivf_centroids' sample-train/apply-wide
split: vocabulary fitting is ALWAYS sample-based at corpus scale (no
production tokenizer trains on 100 TB — a few hundred MB of
representative text saturates the merge table), so training collects a
deterministic bounded sample to the driver (the sample_size docs with
the LOWEST md5(id) — a seeded, engine-portable pick via one distributed
TakeOrdered) and runs classic BPE merge learning in pure Python;
application then runs corpus-wide in an Arrow-batched mapInPandas pass
with the merge table broadcast in the task closure — text never
shuffles, only (id, count) rows continue.

Algorithm (the published BPE recipe): words are whitespace-pretokenized
and terminated with an end-of-word marker; each merge step joins the
most frequent adjacent symbol pair, ties broken deterministically
(count desc, then pair lexicographically asc) so the merge table is a
pure function of the sample. Encoding replays merges greedily by merge
rank — the standard subword-nmt/GPT-2 style encoder.

The reference engine has no tokenizer surface — this belongs to the
training-pipeline extension family (SURVEY §2.11 text analysis,
next to the whitespace/BPE-ish token counters in queries.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_counts(texts: list[str]) -> dict[tuple[str, ...], int]:
    counts: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            key = tuple(w) + (_EOW,)
            counts[key] = counts.get(key, 0) + 1
    return counts


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to n_merges BPE merges from raw texts (driver-side,
    pure Python). Deterministic: ties on pair frequency break
    lexicographically. Stops early when no pair occurs twice."""
    words = _word_counts(texts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _cnt = best
        merges.append((a, b))
        merged = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for sym, cnt in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + cnt
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word by replaying merges in rank order (lowest rank
    first) — the standard BPE encoder."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_train_sample(docs: DataFrame, n_merges: int = 256,
                     sample_size: int = 1024, id_col: str = "doc_id",
                     text_col: str = "text") -> list[tuple[str, str]]:
    """Train a BPE merge table on the sample_size docs with the lowest
    md5('bpe|'||id) — deterministic, engine-portable, one distributed
    TakeOrdered (never a full sort), bounded driver memory."""
    rows = (docs.select(F.col(text_col))
            .orderBy(F.md5(F.concat(F.lit("bpe|"),
                                    F.col(id_col).cast("string"))).asc(),
                     F.col(id_col).asc())
            .limit(sample_size).collect())
    return train_bpe([r[text_col] or "" for r in rows], n_merges)


BPE_SCHEMA = "doc_id bigint, n_words int, n_bpe_tokens int, n_unk_chars int"


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Apply a trained merge table corpus-wide: per-doc BPE token
    counts (plus how many single-character symbols survived un-merged —
    the out-of-vocabulary pressure signal quality filters watch).
    Arrow-batched mapInPandas; the merge table rides the task closure
    (broadcast-sized: a vocab is KBs); text never enters a shuffle."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    vocab = ({a + b for a, b in merges}
             | {a for a, _ in merges} | {b for _, b in merges})

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                ntok = nunk = 0
                for w in words:
                    toks = encode_word(w, ranks)
                    ntok += len(toks)
                    nunk += sum(1 for t in toks
                                if len(t) == 1 and t not in vocab)
                out.append((int(did), len(words), ntok, nunk))
            yield pd.DataFrame(out, columns=[
                "doc_id", "n_words", "n_bpe_tokens", "n_unk_chars"])

    return (docs.select(F.col(id_col), F.col(text_col))
            .mapInPandas(fn, schema=BPE_SCHEMA))
