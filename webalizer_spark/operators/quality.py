"""Training-corpus quality operators: intra-document repetition metrics
and benchmark decontamination.

These extend the engine's LLM-data-pipeline family (dedup, similarity,
lang-ID, quality buckets) with the two filters every large-scale text
pipeline runs before training:

- ``ngram_repetition``: the Gopher/MassiveText repetition signals —
  what fraction of a document is duplicated n-grams, and how much of it
  the single most frequent n-gram covers. Documents dominated by
  boilerplate or template spam light up on both.
- ``decontaminate``: test-set overlap removal — drop every document
  that shares an n-token span with a benchmark/eval prompt, so the
  training corpus cannot leak evaluation data.

Scale design (100 TB):

- ``ngram_repetition`` needs NO shuffle at all: each document's n-grams
  fit in its own row, so the metrics are per-row higher-order-function
  expressions (transform/slice for gram extraction, array_distinct for
  the duplicate fraction, array_sort + aggregate run-length for the top
  count — O(d log d) per doc, all JVM-side, zero Python). An
  explode+groupBy formulation would shuffle every gram of the corpus;
  this one shuffles nothing.
- ``decontaminate`` explodes only GRAM KEYS (16-hex-digit md5 prefixes,
  never text) on the corpus side and broadcasts the benchmark gram set
  — contamination joins are narrow. The contaminated-id set (small by
  construction: contamination is rare) is broadcast back for the
  left_anti, so no wide Exchange ever carries the corpus.

Reference parity: the upstream engine has no training-data notion; these
recast its spam/robot filtering INTENT (webalizer.conf IgnoreSite /
HideAgent block lists `[webalizer.c ƒ...conf (U)]`) onto corpus hygiene,
the same way operators/dedup.py recasts duplicate-hit collapsing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _grams(toks: Column, n: int) -> Column:
    """Token n-grams as strings: empty array when the doc is shorter
    than n tokens (Spark's sequence(1, 0) would DESCEND, not empty)."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>"))


def ngram_repetition(docs: DataFrame, n: int = 2,
                     text_col: str = "text") -> DataFrame:
    """Per-document token-n-gram repetition metrics (Gopher-style):

    - ``ntok``: token count
    - ``ngrams``: n-gram occurrences (ntok - n + 1, 0 if too short)
    - ``dup_ngram_frac``: fraction of n-gram occurrences whose gram
      occurs more than once in the document = 1 - distinct/total
    - ``top_ngram_frac``: occurrences of the single most frequent
      n-gram over total occurrences (token-based recast of Gopher's
      "fraction of characters in the most common n-gram")

    Fractions are ROUND(x, 6) doubles for stable cross-engine hashing;
    both are 0.0 for docs with no n-grams. Zero-shuffle: see module
    docstring."""
    toks = _toks(text_col)
    grams = _grams(toks, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    # top count = longest equal-adjacent run in the sorted gram array
    run = F.aggregate(
        F.array_sort(grams),
        F.named_struct(F.lit("prev"), F.lit(None).cast("string"),
                       F.lit("run"), F.lit(0),
                       F.lit("best"), F.lit(0)),
        lambda acc, g: F.named_struct(
            F.lit("prev"), g,
            F.lit("run"),
            F.when(acc["prev"].eqNullSafe(g), acc["run"] + 1).otherwise(1),
            F.lit("best"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].eqNullSafe(g),
                       acc["run"] + 1).otherwise(1))),
        lambda acc: acc["best"])
    safe_total = F.when(total > 0, total.cast("double"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("ntok"),
        total.alias("ngrams"),
        F.round(F.coalesce(
            F.lit(1.0) - distinct.cast("double") / safe_total,
            F.lit(0.0)), 6).alias("dup_ngram_frac"),
        F.round(F.coalesce(
            run.cast("double") / safe_total, F.lit(0.0)),
            6).alias("top_ngram_frac"),
    )


def _gram_keys(toks: Column, n: int) -> Column:
    """n-gram join keys: 15-hex-digit md5 prefix as bigint (the repo's
    cross-engine hash recipe) — grams never travel as text."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.conv(F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, i, n))), 1, 15),
            16, 10).cast("bigint"))
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<bigint>"))


def contaminated_ids(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                     text_col: str = "text",
                     bench_text_col: str = "text") -> DataFrame:
    """doc_ids of documents sharing at least one token n-gram with any
    benchmark text. Corpus side explodes bigint gram keys (narrow);
    benchmark grams are collected per row then exploded and broadcast —
    the benchmark table is small by definition (an eval set)."""
    # no distinct: left_semi never multiplies matches, and the broadcast
    # HashedRelation collapses duplicate keys — a distinct here would
    # only add an Exchange
    bench = benchmark.select(
        F.explode(_gram_keys(_toks(bench_text_col), n)).alias("gram_key"))
    doc_grams = docs.select(
        "doc_id",
        F.explode(_gram_keys(_toks(text_col), n)).alias("gram_key"))
    return (doc_grams
            .join(F.broadcast(bench), "gram_key", "left_semi")
            .select("doc_id").distinct())


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Remove benchmark-contaminated documents: docs minus every row
    flagged by contaminated_ids. The contaminated set is broadcast for
    the anti-join — contamination is rare, the corpus never shuffles."""
    bad = contaminated_ids(docs, benchmark, n, text_col, bench_text_col)
    return docs.join(F.broadcast(bad), "doc_id", "left_anti")
