"""Training-corpus quality operators: repetition metrics, benchmark
decontamination, cross-document span dedup, LM scoring, and length
distributions.

These extend the engine's LLM-data-pipeline family (dedup, similarity,
lang-ID, quality buckets) with the filters every large-scale text
pipeline runs before training:

- ``ngram_repetition``: the Gopher/MassiveText repetition signals —
  what fraction of a document is duplicated n-grams, and how much of it
  the single most frequent n-gram covers. Documents dominated by
  boilerplate or template spam light up on both.
- ``decontaminate``: test-set overlap removal — drop every document
  that shares an n-token span with a benchmark/eval prompt, so the
  training corpus cannot leak evaluation data.
- ``duplicate_spans`` / ``dedup_spans``: C4-style cross-document span
  dedup — every duplicated non-overlapping n-token span loses all but
  its first occurrence, with the text rebuilt in place.
- ``unigram_logprobs`` / ``lm_perplexity``: CCNet-style quality scoring
  under a corpus-trained add-alpha unigram LM.
- ``length_stats``: per-group token-count distributions (exact and
  t-digest percentile tiers).

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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Bloom-prefilter decontamination (exact result, broadcast-free confirm)
# ---------------------------------------------------------------------------


def bloom_words(keys: DataFrame, key_col: str = "gram_key",
                m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Build a Bloom bitmap over a bigint key column, returned as
    ``m_bits/64`` long words.

    The build is distributed: each key expands to its k bit positions
    (``pmod(xxhash64(key, seed), m)``), positions group to 64-bit words
    with a map-side-combining ``bit_or`` — ONE shuffle of at most
    ``m_bits/64`` (word, bits) rows — and only the finished words are
    collected (bounded by the bitmap size the caller chose, never by
    the key count)."""
    if m_bits % 64 or m_bits < 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in 1..16")
    key = F.col(key_col)
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)])).alias("pos")
    rows = (keys.select(pos)
            .select((F.col("pos") / 64).cast("int").alias("w"),
                    F.call_function(
                        "shiftleft", F.lit(1).cast("bigint"),
                        (F.col("pos") % 64).cast("int")).alias("b"))
            .groupBy("w").agg(F.bit_or("b").alias("bits"))
            .collect())
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def _bloom_hit(key: Column, words: list[int], k: int) -> Column:
    """True iff every one of the key's k Bloom positions is set in the
    literal word array — pure JVM expressions, no Python in the row
    path. ``words`` as a plan literal is the m_bits <= ~2^20 tier; at
    a bigger m the same test ships the numpy bitmap in an Arrow UDF
    closure instead (not needed at any fixture scale here)."""
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    m_bits = 64 * len(words)
    hits = []
    for seed in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("bigint"),
                              (pos % 64).cast("int"))
        hits.append(word.bitwiseAND(bit) != 0)
    out = hits[0]
    for h in hits[1:]:
        out = out & h
    return out


def bloom_contaminated_ids(docs: DataFrame, benchmark: DataFrame,
                           n: int = 8, text_col: str = "text",
                           bench_text_col: str = "text",
                           m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """``contaminated_ids`` with a Bloom prefilter — bit-identical
    output, built for the scale where the benchmark gram set outgrows
    a broadcast HashedRelation.

    100 TB shape: ``contaminated_ids`` broadcasts every benchmark gram
    key; fine for an eval set, impossible when "benchmark" is itself a
    large held-out corpus (dedup-against-eval at CCNet scale). Here the
    benchmark compresses to an m-bit Bloom bitmap (16 MiB covers ~10^8
    grams at k=3 with a small FP rate) that rides the plan; corpus grams
    test membership JVM-side and only the surviving CANDIDATES — a tiny,
    contamination-rate-sized fraction — reach an exact left_semi join
    against the true gram set (AQE sizes it; no broadcast needed on
    either side). Bloom filters have no false negatives, so prefilter +
    exact confirm == the exact operator, row for row; false positives
    only cost confirm-join traffic. Reference intent parity: same as
    ``decontaminate`` (IgnoreSite/HideAgent corpus-hygiene recast)."""
    bench = benchmark.select(
        F.explode(_gram_keys(_toks(bench_text_col), n)).alias("gram_key"))
    words = bloom_words(bench, "gram_key", m_bits, k)
    doc_grams = docs.select(
        "doc_id",
        F.explode(_gram_keys(_toks(text_col), n)).alias("gram_key"))
    candidates = doc_grams.filter(_bloom_hit(F.col("gram_key"), words, k))
    return (candidates.join(bench, "gram_key", "left_semi")
            .select("doc_id").distinct())


# ---------------------------------------------------------------------------
# Cross-document span dedup (C4 / RefinedWeb style)
# ---------------------------------------------------------------------------


def _span_key(span: Column) -> Column:
    """16-hex md5 prefix — spans never cross an Exchange as text."""
    return F.substring(F.md5(span), 1, 16)


def duplicate_spans(docs: DataFrame, n: int = 8, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """C4-style cross-document span duplication: every NON-OVERLAPPING
    n-token span that occurs more than once corpus-wide, minus one
    keeper occurrence (the first by (doc_id, span_idx)).

    Returns (id_col, span_idx) rows to REMOVE — C4 "discard all but one
    of any three-sentence span occurring more than once in the data
    set" recast to token windows, since the engine's corpus rows are
    untokenized word streams. Non-overlapping windows keep the exploded
    volume at tokens/n keys (overlapping grams would be tokens*n).

    Scale design: only (id, idx, 16-hex key) triples shuffle — the
    groupBy(key) is map-side partial and text never leaves its row. The
    keeper is min(struct(id, idx)) per key, no window function.
    Reference parity: recasts the duplicate-hit collapse INTENT of
    webalizer's hashed URL table `[hashtab.c ƒadd_url (U)]` onto
    corpus-level spans, like operators/dedup.py does for whole docs.
    """
    toks = _toks(text_col)
    nspans = (F.size(toks) / n).cast("int")
    spans = (docs
             .select(F.col(id_col),
                     F.posexplode(
                         F.transform(
                             F.sequence(F.lit(0), nspans - 1),
                             lambda i: _span_key(
                                 F.concat_ws(" ", F.slice(toks, i * n + 1,
                                                          n)))))
                     .alias("span_idx", "key"))
             .where(nspans > 0))
    # keeper + count via ONE window over the key partition instead of
    # groupBy + join-back: the join form computed the span explosion
    # (md5 per span — the dominant CPU) twice, once per join side, and
    # paid two Exchanges of the full span stream; the window pays one
    # Exchange + a per-partition sort on the same 16-hex keys (round 7,
    # guide §2.4). Output rows are identical.
    w = Window.partitionBy("key")
    me = F.struct(F.col(id_col), F.col("span_idx"))
    return (spans
            .withColumn("_cnt", F.count(F.lit(1)).over(w))
            .withColumn("_keep", F.min(me).over(w))
            .where((F.col("_cnt") > 1) & (me != F.col("_keep")))
            .select(id_col, "span_idx"))


def dedup_spans(docs: DataFrame, n: int = 8, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Rewrite each document with its duplicated spans removed (keeper
    occurrences and the <n-token tail survive). Adds
    ``n_spans_removed``; all other columns pass through with text_col
    rebuilt via per-row higher-order functions — the corpus joins the
    SMALL removal set on id (AQE picks the strategy; removals are rare
    by construction), it never shuffles on span keys itself."""
    rm = (duplicate_spans(docs, n, id_col, text_col)
          .groupBy(id_col).agg(F.collect_set("span_idx").alias("_rm")))
    toks = _toks(text_col)
    nspans = (F.size(toks) / n).cast("int")
    kept = F.filter(
        F.sequence(F.lit(0), nspans - 1),
        lambda i: ~F.array_contains(F.col("_rm"), i))
    rebuilt = F.concat_ws(
        " ",
        F.flatten(F.concat(
            F.transform(kept, lambda i: F.slice(toks, i * n + 1, n)),
            F.array(F.slice(toks, nspans * n + 1, F.size(toks) - nspans * n)),
        )))
    out = (docs.join(rm, id_col, "left")
           .withColumn("_nrm", F.coalesce(F.size("_rm"), F.lit(0)))
           .withColumn(text_col,
                       F.when(F.col("_nrm") > 0, rebuilt)
                       .otherwise(F.col(text_col))))
    return (out.select(*docs.columns, F.col("_nrm")
                       .cast("int").alias("n_spans_removed")))


# ---------------------------------------------------------------------------
# Any-length substring dedup (suffix-array / ExactSubstr family)
# ---------------------------------------------------------------------------


def duplicated_gram_starts(docs: DataFrame, min_len: int = 16,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """SLIDING min_len-gram occurrences that duplicate corpus-wide,
    minus one keeper per gram: (id_col, s) rows whose token window
    [s, s+min_len) must be removed.

    This is the candidate layer of suffix-array substring dedup
    ("deduplicating training data makes language models better",
    ExactSubstr): a token position sits inside SOME duplicated
    substring of length >= min_len IFF it is covered by a duplicated
    sliding min_len-gram — any longer repeat is a run of repeated
    min_len-grams, so fixed-width gram keys decide arbitrary-length
    repeats exactly, without materializing a suffix array (which does
    not distribute). The keeper is the global min(struct(id, s)) per
    gram, so the corpus-first occurrence of a long repeat survives
    intact while every other occurrence is covered end-to-end.

    Scale shape: sliding windows explode to ~tokens rows, but each row
    is (id, int, 16-hex key) — the groupBy(key) Exchange never carries
    text (plan-asserted in tests/test_plans.py). Contrast
    duplicate_spans: NON-overlapping fixed spans (the C4 rule, 1/n the
    key volume) vs. sliding grams here (any-length semantics, ~n keys).
    """
    toks = _toks(text_col)
    nkeys = F.size(toks) - min_len + 1
    grams = (docs
             .select(F.col(id_col),
                     F.posexplode(
                         F.transform(
                             F.sequence(F.lit(0), nkeys - 1),
                             lambda s: _span_key(
                                 F.concat_ws(" ", F.slice(toks, s + 1,
                                                          min_len)))))
                     .alias("s", "key"))
             .where(nkeys > 0))
    # keeper + count via ONE window over the key partition instead of
    # groupBy + join-back: the join form computed the sliding-gram
    # explosion (md5 per gram — the dominant CPU) twice, once per join
    # side, and paid two Exchanges of the full gram stream; the window
    # pays one Exchange + a per-partition sort on the same 16-hex keys
    # (round 7, guide §2.4). Output rows are identical.
    w = Window.partitionBy("key")
    me = F.struct(F.col(id_col), F.col("s"))
    return (grams
            .withColumn("_cnt", F.count(F.lit(1)).over(w))
            .withColumn("_keep", F.min(me).over(w))
            .where((F.col("_cnt") > 1) & (me != F.col("_keep")))
            .select(id_col, "s"))


def dedup_substrings(docs: DataFrame, min_len: int = 16,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Rewrite each document with every duplicated substring of
    >= min_len tokens removed (the corpus-first occurrence survives).
    Adds ``n_tokens_removed``; other columns pass through with
    text_col rebuilt. The any-length companion to dedup_spans: a
    300-token boilerplate block repeated across pages disappears
    wholesale, not just its span-aligned chunks.

    Scale design: only (id, gram-start int) pairs come back from the
    key shuffle — they aggregate to ONE small (id, starts-array) row
    per affected doc, and the corpus joins that removal set by id (AQE
    / broadcast — removals are rare by construction). The rebuild is a
    per-row higher-order filter: token i survives unless some start
    covers it (exists() over the doc's own starts — O(dups) per token,
    zero extra Exchange, text never shuffles).
    """
    rm = (duplicated_gram_starts(docs, min_len, id_col, text_col)
          .groupBy(id_col)
          .agg(F.sort_array(F.collect_set("s")).alias("_rm")))
    toks = _toks(text_col)

    def _covered(i: Column) -> Column:
        return F.exists("_rm", lambda st: (st <= i)
                        & (i < st + F.lit(min_len)))

    kept = F.filter(toks, lambda _t, i: ~_covered(i))
    out = (docs.join(rm, id_col, "left")
           .withColumn("_nrm",
                       F.when(F.col("_rm").isNotNull(),
                              F.size(toks) - F.size(kept))
                       .otherwise(F.lit(0)))
           .withColumn(text_col,
                       F.when(F.col("_nrm") > 0, F.concat_ws(" ", kept))
                       .otherwise(F.col(text_col))))
    return (out.select(*docs.columns, F.col("_nrm")
                       .cast("int").alias("n_tokens_removed")))


# ---------------------------------------------------------------------------
# Corpus language-model scoring (CCNet style)
# ---------------------------------------------------------------------------


def unigram_logprobs(docs: DataFrame, text_col: str = "text",
                     alpha: float = 0.5) -> DataFrame:
    """Corpus unigram LM with add-alpha smoothing: (token, logp) plus
    one UNK row (token NULL) for out-of-vocabulary mass. Two scalars
    (corpus size, vocab size) ride a scalar-aggregate crossJoin —
    broadcast, no global window. CCNet scores corpora with a reference
    KenLM; this is the engine-native equivalent trained on the corpus
    itself (or any reference DataFrame you pass)."""
    counts = (docs.select(F.explode(_toks(text_col)).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")))
    tot = counts.agg(F.sum("cnt").alias("_total"),
                     F.count(F.lit(1)).alias("_vocab"))
    denom = F.col("_total") + F.lit(alpha) * (F.col("_vocab") + 1)
    with_unk = counts.unionByName(          # tot has exactly one row,
        tot.select(F.lit(None).cast("string").alias("token"),   # so this
                   F.lit(0).cast("bigint").alias("cnt")))       # adds UNK
    return (with_unk.crossJoin(F.broadcast(tot.select(
                F.col("_total"), F.col("_vocab"))))
            .select("token", "cnt",
                    F.log((F.col("cnt") + alpha) / denom).alias("logp")))


def lm_perplexity(docs: DataFrame, lm: DataFrame | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  alpha: float = 0.5) -> DataFrame:
    """Per-document unigram negative-log-likelihood + perplexity under
    ``lm`` (default: trained on ``docs`` itself). The quality filter
    CCNet/C4 pipelines run: high perplexity = far from the reference
    distribution = drop or down-bucket.

    Scale design: tokens explode WITHOUT the text column, the LM is
    broadcast into the lookup join (OOV falls back to the UNK row's
    logp), and the per-doc groupBy collapses map-side to one skinny
    (id, decimal-sum) row per partition — no Exchange ever carries
    corpus text or the token stream. Per-token logp is rounded to 6dp
    (decimal) before the exact sum so the answer is independent of
    aggregation order — the engine-wide oracle-determinism recipe."""
    if lm is None:
        lm = unigram_logprobs(docs, text_col, alpha)
    # materialize the LM once (lazy local checkpoint — the with_rank
    # recipe): the UNK validation count, the UNK-row broadcast and the
    # vocab-row broadcast below are three separate reads of lm, and a
    # trained lm's lineage is a full corpus token aggregation — without
    # this barrier that aggregation executed three times per call
    # (round-6 ADVICE). The LM is vocab-bounded, broadcast-sized by
    # contract, so the checkpoint is small at any corpus scale.
    lm = lm.localCheckpoint(eager=False)
    unk = lm.where(F.col("token").isNull()) \
            .select(F.col("logp").alias("_unk_logp"))
    # a caller-supplied lm without exactly one NULL-token (UNK) row
    # would make the crossJoin below silently empty the result (0 UNK
    # rows) or duplicate every token (>1); fail loudly instead. The
    # count is on the tiny checkpointed lm, not the corpus.
    n_unk = unk.limit(2).count()
    if n_unk != 1:
        raise ValueError(
            f"lm must contain exactly one NULL-token (UNK) row, found "
            f"{'0' if n_unk == 0 else '>=2'} — train it with "
            "unigram_logprobs() or add the UNK fallback row")
    toks = (docs.select(id_col, F.explode(_toks(text_col)).alias("token")))
    scored = (toks
              .join(F.broadcast(lm.where(F.col("token").isNotNull())),
                    "token", "left")
              .crossJoin(F.broadcast(unk))
              .select(id_col,
                      F.coalesce("logp", "_unk_logp").alias("_lp")))
    dec = F.round(F.col("_lp"), 6).cast("decimal(24,6)")
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("ntok"),
                 (-F.sum(dec)).cast("double").alias("nll"))
            .select(id_col, "ntok",
                    F.round("nll", 6).alias("nll"),
                    F.round(F.exp(F.col("nll") / F.col("ntok")), 6)
                    .alias("ppl")))


# ---------------------------------------------------------------------------
# C4-style line-level cleaning
# ---------------------------------------------------------------------------


def c4_line_filter(docs: DataFrame, min_words: int = 5,
                   min_lines: int = 3,
                   blocklist: tuple[str, ...] = ("javascript",
                                                 "lorem ipsum", "cookie"),
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """C4's line-level cleaning rules, applied inside each document:

    keep a line only if it (1) ends in a terminal punctuation mark
    (``. ! ? "``), (2) has at least ``min_words`` whitespace words,
    (3) contains no blocklist term (case-folded substring match) and
    (4) contains no curly brace (the C4 lorem-ipsum/JS-code heuristics).
    Documents with fewer than ``min_lines`` surviving lines are dropped
    entirely (C4 drops pages with <3 sentences). Output: ``id_col``,
    rebuilt ``text_col`` (kept lines joined by newline), ``n_kept``,
    ``n_dropped``.

    Scale design: pure per-row HOFs — split, filter-lambda, rebuild —
    zero Exchange, zero Python; composes in front of the span/substring
    dedup operators exactly as the C4 pipeline orders them."""
    if min_words < 1 or min_lines < 1:
        raise ValueError("min_words and min_lines must be >= 1")
    # two-step projection via _lines: the output alias reuses text_col
    # and Spark 4 lateral alias resolution would otherwise leave later
    # same-select size() expressions exposed to rebinding against the
    # REBUILT text (the dedup_lines pitfall; here the keep rule is
    # idempotent so it happened to not bite, but harden anyway)
    base = docs.select(F.col(id_col),
                       F.split(F.col(text_col), "\n").alias("_lines"))
    lines = F.col("_lines")

    def keep(line: Column) -> Column:
        low = F.lower(line)
        # whitespace words: runs of spaces/tabs are ONE separator and
        # leading/trailing whitespace doesn't mint empty tokens (a
        # single-space split counted 'one  two  three.' as 5 words)
        words = F.filter(F.split(F.trim(line), r"\s+"),
                         lambda t: t != "")
        cond = (line.rlike('[.!?"]$')
                & (F.size(words) >= min_words)
                & ~low.contains("{"))
        for term in blocklist:
            cond = cond & ~low.contains(term.lower())
        return cond

    kept = F.filter(lines, keep)
    return (base.select(
                F.col(id_col),
                F.array_join(kept, "\n").alias(text_col),
                F.size(kept).alias("n_kept"),
                (F.size(lines) - F.size(kept)).alias("n_dropped"))
            .filter(F.col("n_kept") >= min_lines))


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-grams)
# ---------------------------------------------------------------------------


def _feat_buckets(toks: Column, n_buckets: int) -> Column:
    """DSIR's hashed n-gram features: every unigram and bigram, md5-
    prefix-hashed into ``n_buckets`` buckets (the repo's cross-engine
    bigint hash recipe, mod B)."""
    feats = F.concat(toks, _grams(toks, 2))
    return F.transform(
        feats,
        lambda g: (F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
                   .cast("bigint") % n_buckets).cast("int"))


def dsir_bucket_logratios(docs: DataFrame, target: DataFrame,
                          n_buckets: int = 1024, alpha: float = 0.5,
                          text_col: str = "text",
                          target_text_col: str = "text") -> DataFrame:
    """Fit the two DSIR bag-of-hashed-ngrams models and return one row
    per bucket with the importance log-ratio
    ``ln(p_target(b)) - ln(p_raw(b))`` (add-alpha smoothed, ROUND 6 for
    the cross-engine determinism recipe).

    Scale design: model fitting is two feature-count aggregations whose
    outputs are bounded by B (map-side combine collapses each task to
    <= B rows before the Exchange), plus two scalar totals. Nothing
    here grows with the corpus."""
    def counts(df: DataFrame, tc: str, out: str) -> DataFrame:
        return (df.select(F.explode(
                    _feat_buckets(_toks_safe(tc), n_buckets)).alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias(out)))

    # materialize the (<= n_buckets)-row count tables ONCE: the scalar
    # totals below and the broadcast joins both read them, and without
    # the checkpoint each corpus aggregation would execute twice (once
    # for .first(), again when the joined plan runs)
    raw_cnt = counts(docs, text_col, "rc").localCheckpoint(eager=True)
    tgt_cnt = counts(target, target_text_col, "tc") \
        .localCheckpoint(eager=True)
    totals = (raw_cnt.agg(F.sum("rc")).first()[0] or 0,
              tgt_cnt.agg(F.sum("tc")).first()[0] or 0)
    denom_r = float(totals[0]) + alpha * n_buckets
    denom_t = float(totals[1]) + alpha * n_buckets
    spark = docs.sparkSession
    allb = spark.range(n_buckets).select(F.col("id").alias("b"))
    return (allb
            .join(F.broadcast(raw_cnt), "b", "left")
            .join(F.broadcast(tgt_cnt), "b", "left")
            .select(
                F.col("b").cast("int").alias("b"),
                F.round(
                    F.log((F.coalesce("tc", F.lit(0)) + alpha) / denom_t)
                    - F.log((F.coalesce("rc", F.lit(0)) + alpha) / denom_r),
                    6).cast("decimal(18,6)").alias("log_ratio")))


def _toks_safe(text_col: str) -> Column:
    """NULL text scores like the empty string (one '' unigram) instead
    of poisoning HOF aggregates with NULL arrays."""
    return F.split(F.coalesce(F.col(text_col), F.lit("")), " ")


def dsir_logweights(docs: DataFrame, target: DataFrame,
                    n_buckets: int = 1024, alpha: float = 0.5,
                    id_col: str = "doc_id", text_col: str = "text",
                    target_text_col: str = "text") -> DataFrame:
    """Per-document DSIR importance log-weight
    ``sum over features f of (ln p_t(f) - ln p_r(f))``.

    Scale design: the fitted B-bucket log-ratio table is collected
    (bounded by B, never by data) and embedded as a literal decimal
    array, so SCORING is a zero-shuffle per-row HOF pass — each doc
    folds its own feature buckets through element_at + exact decimal
    adds. No join, no Exchange, no Python in the row path (contrast
    lm_perplexity, which demonstrates the broadcast-join formulation;
    at B beyond literal-plan size the same table rides a broadcast
    join instead)."""
    ratios = dsir_bucket_logratios(docs, target, n_buckets, alpha,
                                   text_col, target_text_col).collect()
    by_b = {r["b"]: r["log_ratio"] for r in ratios}
    arr = F.array(*[F.lit(str(by_b[b])).cast("decimal(18,6)")
                    for b in range(n_buckets)])
    logw = F.aggregate(
        _feat_buckets(_toks_safe(text_col), n_buckets),
        F.lit("0").cast("decimal(28,6)"),
        lambda acc, b: (acc + F.element_at(arr, b + 1))
        .cast("decimal(28,6)"))
    return docs.select(
        F.col(id_col),
        F.round(logw.cast("double"), 6).alias("logw"))


def dsir_sample(docs: DataFrame, target: DataFrame, k: int,
                n_buckets: int = 1024, alpha: float = 0.5,
                id_col: str = "doc_id", text_col: str = "text",
                target_text_col: str = "text") -> DataFrame:
    """DSIR selection: top-k documents by importance log-weight plus
    deterministic Gumbel noise (Gumbel-top-k == sampling without
    replacement proportionally to the importance weights).

    The Gumbel draw must be reproducible across engines, so u comes
    from the doc id's md5 (13 hex digits -> (0,1), exact in a double)
    and g = -ln(-ln(u)) rounds to 6dp before the add — no RNG state
    anywhere. Selection is orderBy+limit (TakeOrderedAndProject: per-
    partition heaps, no global sort) with doc_id as the tiebreak."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13),
               16, 10).cast("bigint")
    u = (h + 1).cast("double") / F.lit(float((1 << 52) + 2))
    g = F.round(-F.log(-F.log(u)), 6)
    lw = dsir_logweights(docs, target, n_buckets, alpha, id_col,
                         text_col, target_text_col)
    return (lw.select(
                id_col, "logw",
                F.round(F.col("logw") + g, 6).alias("score"))
            .orderBy(F.desc("score"), id_col)
            .limit(k))


# ---------------------------------------------------------------------------
# Corpus length distributions
# ---------------------------------------------------------------------------


def length_stats(docs: DataFrame, by: str = "source",
                 text_col: str = "text",
                 exact: bool = True) -> DataFrame:
    """Per-group token-count distribution: doc count, total/mean tokens,
    p50/p90/p99 — the length profile every corpus audit opens with
    (extends the reference's averages/maxima family `[webalizer.c
    ƒmonth_total_table avg/max rows (U)]` with percentiles).

    ``exact=True`` uses sort-based percentile — order-independent by
    construction, but it buffers each group's values in the aggregation
    state, so it is for BOUNDED group cardinality at moderate per-group
    counts (a per-source audit table, not a per-doc one). At 100 TB the
    scale path is ``exact=False``: approx_percentile's t-digest sketch
    is mergeable map-side and holds O(1/accuracy) state per group, the
    same exact-vs-sketch split as A8's countDistinct vs HLL tier."""
    ntok = F.size(_toks(text_col)).cast("bigint")
    pct = (F.percentile(ntok, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
           if exact else
           F.approx_percentile(ntok, F.array(F.lit(0.5), F.lit(0.9),
                                             F.lit(0.99)), 10000))
    return (docs.groupBy(by)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(ntok).alias("total_tok"),
                 pct.alias("_pct"))
            .select(by, "n_docs", "total_tok",
                    F.round(F.col("total_tok") / F.col("n_docs"), 6)
                    .alias("mean_tok"),
                    F.col("_pct")[0].cast("double").alias("p50_tok"),
                    F.col("_pct")[1].cast("double").alias("p90_tok"),
                    F.col("_pct")[2].cast("double").alias("p99_tok")))


def mixing_weights(docs: DataFrame, targets: DataFrame,
                   budget_tokens: int, max_epochs: float = 4.0,
                   by: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Static source-mixture planning — the step that turns a curated
    corpus into a training mixture: given per-source target shares and
    a total token budget, compute per-source sampling epochs capped at
    max_epochs (the standard guard against over-repeating a small
    source) and the realized token counts/shares after capping.

    targets is a (by, target_share) table; shares are normalized
    in-operator so callers can pass un-normalized priorities. Sources
    missing from targets mix at share 0 (epochs 0); desired tokens =
    budget * share, epochs = min(desired / available, max_epochs),
    realized = round(epochs * available).

    100 TB shape: ONE aggregation over the corpus (per-source token
    sums — a handful of output rows), targets and the two scalar
    totals broadcast; no window, no second corpus pass. The per-doc
    sampling step downstream is a broadcast join of these weights onto
    the corpus (same shape as sampling.stratified_sample).
    """
    ntok = F.size(_toks(text_col)).cast("bigint")
    avail = (docs.groupBy(by)
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(ntok).alias("available_tok")))
    tshare = targets.select(F.col(by), F.col("target_share")
                            .cast("double").alias("_raw"))
    tot_raw = tshare.agg(F.sum("_raw").alias("_tot"))
    tshare = (tshare.crossJoin(F.broadcast(tot_raw))
              .select(by, (F.col("_raw") / F.col("_tot"))
                      .alias("target_share")))
    mixed = (avail.join(F.broadcast(tshare), by, "left")
             .withColumn("target_share",
                         F.coalesce("target_share", F.lit(0.0)))
             .withColumn("desired_tok",
                         F.col("target_share") * F.lit(float(budget_tokens)))
             .withColumn("epochs",
                         F.round(F.least(
                             F.col("desired_tok") / F.col("available_tok"),
                             F.lit(float(max_epochs))), 6))
             .withColumn("realized_tok",
                         F.round(F.col("epochs")
                                 * F.col("available_tok")).cast("bigint")))
    tot_real = mixed.agg(F.sum("realized_tok").alias("_rt"))
    return (mixed.crossJoin(F.broadcast(tot_real))
            .select(by, "n_docs", "available_tok",
                    F.round("target_share", 6).alias("target_share"),
                    F.round("desired_tok", 2).alias("desired_tok"),
                    "epochs", "realized_tok",
                    F.round(F.col("realized_tok") / F.col("_rt"), 6)
                    .alias("realized_share")))


def tf_idf(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text", min_df: int = 1,
           smooth: bool = True) -> DataFrame:
    """Per-(doc, term) TF-IDF weights — the corpus-statistics weighting
    behind quality filtering, keyword extraction and sparse retrieval.
    tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1 when smooth
    (the standard smoothed form — never zero, division-safe) else
    ln(N/df); weight = tf * idf rounded to 6dp (the engine-wide
    cross-engine float recipe).

    100 TB shape: tokenize/explode is NARROW; term counts shuffle once
    on (doc, term) with map-side partial aggregation; document
    frequencies aggregate the (doc, term) pairs again on term (partial
    combine — each partition contributes at most one (term, count)
    fragment); the corpus row count is a scalar aggregate BROADCAST
    into the idf projection, not a window. min_df prunes the hapax
    tail BEFORE the tf join, which at web scale removes most of the
    vocabulary (Zipf) and with it most of the join's right side.
    """
    pairs = (docs.select(F.col(id_col),
                         F.explode(_toks(text_col)).alias("term"))
             .filter(F.col("term") != "")
             .groupBy(id_col, "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    df_t = (pairs.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= min_df))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("_n"))
    if smooth:
        idf = F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0
    else:
        idf = F.log(F.col("_n") / F.col("df"))
    weighted = (pairs.join(df_t, "term")
                .crossJoin(F.broadcast(n_docs))
                .select(id_col, "term", "tf", "df",
                        F.round(F.col("tf") * idf, 6).alias("tfidf")))
    return weighted


def top_terms(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
              text_col: str = "text", min_df: int = 1) -> DataFrame:
    """Top-k terms per document by TF-IDF (tie-break: term ascending) —
    keyword extraction over the corpus. The per-doc ranking window
    partitions on the document id, so unlike a global ranking it scales
    with no single hot partition."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (tf_idf(docs, id_col, text_col, min_df)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "term", "tf", "df", "tfidf"))


def pagerank(edges: DataFrame, n_iters: int = 8, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the canonical
    iterative graph scorer (link-based quality weighting for crawled
    corpora). Dangling-node mass (nodes with no out-edges) is
    redistributed uniformly each iteration, the standard correction.

    Determinism recipe (cross-engine, order-independent): per-edge
    contributions round to 6dp and sum as DECIMAL(38,6) — exact
    regardless of aggregation order — then return to double for the
    rank update; the same recipe as the LM log-prob sum. Output ranks
    round at 6dp.

    100 TB shape: per iteration ONE shuffle keyed on dst for the
    contribution aggregate (map-side partial over the decimal sums)
    plus the broadcast dangling scalar; the rank vector is (node,
    double) — never the adjacency payload; localCheckpoint every
    third round truncates the iterative lineage exactly like
    dedup.dup_components' pointer-jumping loop. Iteration count is
    FIXED (not convergence-tested) so the result is a deterministic
    function of the graph.
    """
    # loop invariants materialize ONCE — without the checkpoint every
    # iteration would re-derive the edge scan, the nodes distinct and
    # the out-degree aggregate through raw lineage (3x per round)
    e = edges.select(F.col(src_col).alias("node"),
                     F.col(dst_col).alias("dst")) \
        .localCheckpoint(eager=True)
    nodes = (e.select("node").union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    outdeg = e.groupBy("node").agg(F.count(F.lit(1)).alias("deg")) \
        .localCheckpoint(eager=True)
    n = nodes.count()          # bounded driver scalar (node count)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iters):
        contrib = (e.join(ranks, "node").join(outdeg, "node")
                   .select("dst",
                           F.round(F.col("rank") / F.col("deg"), 6)
                           .cast("decimal(38,6)").alias("_c"))
                   .groupBy("dst")
                   .agg(F.sum("_c").cast("double").alias("contrib")))
        dang = (ranks.join(outdeg, "node", "left_anti")
                .agg(F.coalesce(
                    F.sum(F.round(F.col("rank"), 6)
                          .cast("decimal(38,6)")),
                    F.lit(0).cast("decimal(38,6)"))
                    .cast("double").alias("_m")))
        ranks = (nodes.join(contrib,
                            nodes["node"] == contrib["dst"], "left")
                 .crossJoin(F.broadcast(dang))
                 .select(nodes["node"],
                         ((1.0 - damping) / n
                          + damping * (F.coalesce(F.col("contrib"),
                                                  F.lit(0.0))
                                       + F.col("_m") / n)).alias("rank")))
        if (it + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def blocklist_stats(docs: DataFrame, terms: list[str],
                    id_col: str = "doc_id", text_col: str = "text",
                    substring: bool = False) -> DataFrame:
    """Per-doc blocklist pressure — the Gopher/C4-style 'dirty word'
    metric behind the standard drop rule: token occurrences matching a
    (case-folded) term list, and their fraction of the doc. substring
    mode instead flags any term occurring as a substring (the URL/slur
    variant of the rule). The term list is a bounded config artifact,
    so it rides the plan as a LITERAL array — per-row higher-order
    functions only, zero shuffle, no join."""
    blocked, frac = _blocklist_frac(terms, text_col, substring)
    n = F.size(F.split(F.lower(F.col(text_col)), " "))
    return docs.select(
        F.col(id_col), n.cast("bigint").alias("n_tokens"),
        blocked.alias("blocked_tokens"),
        F.round(frac, 6).alias("blocked_frac"))


def _blocklist_frac(terms: list[str], text_col: str,
                    substring: bool) -> tuple[F.Column, F.Column]:
    """(blocked_tokens, blocked_frac) expressions shared by stats and
    filter so the two can never disagree on which docs are dirty. BOTH
    modes case-fold the text against the lowercased term list."""
    blk = F.array(*[F.lit(t.lower()) for t in terms])
    if substring:
        hits = F.size(F.filter(
            blk, lambda b: F.lower(F.col(text_col)).contains(b)))
        return (F.lit(None).cast("bigint"),
                F.when(hits > 0, 1.0).otherwise(0.0))
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    blocked = F.size(F.filter(
        toks, lambda t: F.array_contains(blk, t))).cast("bigint")
    return blocked, F.when(n > 0, blocked / n).otherwise(F.lit(0.0))


def blocklist_filter(docs: DataFrame, terms: list[str],
                     max_frac: float = 0.0, id_col: str = "doc_id",
                     text_col: str = "text",
                     substring: bool = False) -> DataFrame:
    """Keep docs whose blocklist fraction is <= max_frac (default 0 —
    any hit drops, the strict C4 rule; Gopher-style thresholds pass
    e.g. 0.05). The predicate evaluates INLINE on each row (no join,
    no id collection — a keep-set join would move most of the corpus
    through a broadcast for nothing), so the whole filter is one
    narrow pass."""
    _blocked, frac = _blocklist_frac(terms, text_col, substring)
    return docs.filter(F.round(frac, 6) <= max_frac)


NORM_SCHEMA = "doc_id bigint, text string, changed boolean"


def normalize_text(docs: DataFrame, form: str = "NFC",
                   collapse_ws: bool = True, strip_controls: bool = True,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode + whitespace normalization — the cleaning stage between
    raw extraction and every downstream hash/dedup/tokenize step
    (un-normalized text makes byte-level dedup miss visually identical
    docs). Three rules, each optional: canonical Unicode form (NFC by
    default; NFKC for the aggressive variant), C0/C1 control-character
    removal (tab/newline survive as whitespace), and whitespace
    collapse (runs of whitespace -> one space, ends trimmed).

    The Unicode form runs FIRST (NFKC can fold characters INTO
    whitespace — e.g. NBSP — which the collapse must then see), as an
    Arrow-batched mapInPandas over stdlib unicodedata (Spark SQL has
    no normalization builtin); the control/whitespace rules then run
    as codegen'd regexp_replace (JVM). Text stays in its partition —
    no shuffle. `changed` marks rows the pass rewrote."""
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "_orig": pdf[text_col],
                "_normed": [unicodedata.normalize(form, t)
                            if t is not None else None
                            for t in pdf[text_col]],
            })

    staged = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, schema=f"{id_col} bigint, _orig string, _normed string")
    out = F.col("_normed")
    if strip_controls:
        # C0 (minus tab/newline/CR, which survive as whitespace), DEL,
        # and the C1 range U+0080-U+009F (cp1252-mojibake controls)
        out = F.regexp_replace(
            out,
            r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{0080}-\x{009F}]", "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return staged.select(
        F.col(id_col).alias("doc_id"),
        out.alias("text"),
        (~out.eqNullSafe(F.col("_orig"))).alias("changed"))


def quantile_bins(df: DataFrame, score_col: str, n_bins: int = 4,
                  exact: bool = True,
                  accuracy: int = 10000) -> DataFrame:
    """Assign every row to a corpus-quantile bin of its score (1 =
    lowest) — the quality-binning step behind curriculum ordering and
    per-band mixing. Thresholds come from ONE scalar aggregate
    (exact interpolated percentile for bounded inputs / the graded
    oracle; ``exact=False`` flips to the approx_percentile t-digest —
    the same exact-vs-sketch split as length_stats) broadcast back
    into a per-row higher-order lookup: bin = 1 + number of interior
    thresholds strictly below the score. NO ntile window — a global
    ranking window would single-partition the corpus; this shape is
    one tiny aggregate plus a narrow projection."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    pct = (F.percentile(F.col(score_col), F.array(*[F.lit(q) for q in qs]))
           if exact else
           F.approx_percentile(F.col(score_col),
                               F.array(*[F.lit(q) for q in qs]), accuracy))
    th = df.agg(pct.alias("_th"))
    bin_expr = (F.lit(1) + F.size(F.filter(
        F.col("_th"),
        lambda t: F.col(score_col).cast("double") > t))).cast("int")
    # NULL score -> NULL bin: the HOF filter drops NULL predicates, so
    # without the guard unscored rows would silently land in band 1
    return (df.crossJoin(F.broadcast(th))
            .withColumn("bin", F.when(F.col(score_col).isNotNull(),
                                      bin_expr))
            .drop("_th"))


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact: bool = True, rsd: float = 0.05) -> DataFrame:
    """Per-column data profile — the first sweep any large-scale
    ingest runs over a new table: one row per column with row count,
    null count, distinct count and min/max rendered to strings under a
    deterministic cross-engine policy (floats round to 6dp and print
    as DECIMAL(30,6) so two engines can't disagree on double repr —
    wide enough that routine large doubles like epoch millis
    (~1.7e12) render instead of overflowing to NULL/ANSI error;
    timestamps and everything else CAST to string).

    Scale shape: ONE aggregate pass over the table computes every
    metric (count/min/max are plain partial aggregates; distinct
    counts are exact by default for oracle parity — Catalyst plans
    multi-distinct via Expand, fine at graded scale — and
    ``exact=False`` flips every distinct to approx_count_distinct's
    HyperLogLog++, restoring the single-pass no-Expand plan for the
    100 TB tier). The wide 1-row result then unpivots through a
    narrow literal-array explode — no per-column scans, no shuffle of
    table data beyond the aggregate's own partials."""
    cols = columns if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    dtypes = dict(df.dtypes)

    def render(c: str, agg) -> Column:
        if dtypes[c] in ("double", "float"):
            return F.round(agg(F.col(c)), 6).cast("decimal(30,6)") \
                    .cast("string")
        return agg(F.col(c)).cast("string")

    aggs = [F.count(F.lit(1)).alias("_nrows")]
    for c in cols:
        nd = (F.count_distinct(F.col(c)) if exact
              else F.approx_count_distinct(F.col(c), rsd))
        aggs += [F.count(F.col(c)).alias(f"_nn_{c}"),
                 nd.alias(f"_nd_{c}"),
                 render(c, F.min).alias(f"_min_{c}"),
                 render(c, F.max).alias(f"_max_{c}")]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(f"_nn_{c}").alias("nn"),
                 F.col(f"_nd_{c}").alias("nd"),
                 F.col(f"_min_{c}").alias("mn"),
                 F.col(f"_max_{c}").alias("mx"))
        for c in cols])
    e = F.explode(entries).alias("e")
    return (wide.select("_nrows", e)
            .select(F.col("e.column_name").alias("column_name"),
                    F.col("_nrows").alias("n_rows"),
                    (F.col("_nrows") - F.col("e.nn")).alias("n_nulls"),
                    F.col("e.nd").alias("n_distinct"),
                    F.col("e.mn").alias("min_val"),
                    F.col("e.mx").alias("max_val")))


def bigram_logmodel(docs: DataFrame, text_col: str = "text",
                    alpha: float = 0.5) -> tuple[DataFrame, DataFrame]:
    """Corpus bigram model components: ((prev, token, cnt_vw) pair
    counts, (prev, cnt_v) context totals). Conditional probability is
    assembled at scoring time as (cnt_vw + alpha) / (cnt_v + alpha *
    (V + 1)) with V the UNIGRAM vocabulary — add-alpha over the
    closed vocab + UNK, the same smoothing family as
    unigram_logprobs. Two plain groupBy counts; nothing collected."""
    pairs = (docs.select(F.explode(_bigram_pairs(text_col)).alias("p"))
             .select(F.col("p.prev").alias("prev"),
                     F.col("p.tok").alias("token"))
             .where(F.col("prev").isNotNull()))
    vw = (pairs.groupBy("prev", "token")
          .agg(F.count(F.lit(1)).alias("cnt_vw")))
    # context totals re-aggregate the COUNT TABLE, not the token
    # stream: sum_w c(v,w) == count of v in context position, and vw is
    # orders of magnitude smaller than the pair stream it summarizes
    v = vw.groupBy("prev").agg(F.sum("cnt_vw").alias("cnt_v"))
    return vw, v


def _bigram_pairs(text_col: str) -> Column:
    """(prev, tok) structs per position: prev NULL at position 0 (the
    doc-initial token scores with the unigram model alone — no BOS
    event pollutes the bigram counts). Pure HOF, no window, no
    shuffle."""
    toks = _toks_safe(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.struct(
            F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
            F.element_at(toks, i).alias("tok")))


def lm_perplexity_bigram(docs: DataFrame, lam: float = 0.8,
                         id_col: str = "doc_id", text_col: str = "text",
                         alpha: float = 0.5) -> DataFrame:
    """Per-document perplexity under an INTERPOLATED bigram LM trained
    on the corpus: p(w|v) = lam * p_bigram(w|v) + (1-lam) *
    p_unigram(w); doc-initial tokens score with the unigram component
    alone. One step up the n-gram ladder from lm_perplexity toward
    CCNet's KenLM reference — catches word-SALAD that unigram
    perplexity cannot (right words, wrong order).

    Scale shape: token pairs explode WITHOUT the text column (HOF
    struct transform, no window); the bigram pair/context tables join
    on their natural keys (AQE sizes them — they are count tables, far
    smaller than the token stream); the unigram LM broadcasts like
    lm_perplexity; per-token logp rounds to 6dp decimal pre-sum so the
    result is aggregation-order-independent."""
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1) — lam=1 drops the "
                         "unigram floor and unseen bigrams hit log(0)")
    # coalesce NULL text ONCE so the unigram model and the pair stream
    # tokenize identically (_toks drops NULL-text docs from training
    # while _toks_safe scores them — a total/vocab split the DuckDB
    # oracle's coalesce would expose on any corpus with NULL text)
    docs = docs.withColumn(text_col,
                           F.coalesce(F.col(text_col), F.lit("")))
    uni = unigram_logprobs(docs, text_col, alpha)
    vocab = uni.where(F.col("token").isNotNull()) \
        .agg(F.count(F.lit(1)).alias("_vocab"))
    unk = uni.where(F.col("token").isNull()) \
        .select(F.col("logp").alias("_unk_logp"))
    vw, v = bigram_logmodel(docs, text_col, alpha)
    uni_nn = uni.where(F.col("token").isNotNull()).select("token", "logp")

    # Round 7 (guide §2.3/§2.4): assemble ONE (prev, token) -> p score
    # table from the COUNT tables (vw x v x unigram — all vocab-bounded)
    # so the full pair stream joins once on its natural key instead of
    # three times (vw on (prev, token), v on (prev), unigram broadcast).
    # The model is trained on the very corpus it scores, so every
    # non-initial pair hits the table by construction; the arithmetic
    # below is the SAME double expression tree as the old per-pair form,
    # evaluated once per distinct pair instead of once per occurrence —
    # bit-identical results.
    p_big = ((F.coalesce(F.col("cnt_vw"), F.lit(0)) + alpha)
             / (F.coalesce(F.col("cnt_v"), F.lit(0))
                + alpha * (F.col("_vocab") + 1)))
    p_uni = F.exp(F.coalesce("logp", "_unk_logp"))
    score = (vw.join(v, "prev")
             .join(F.broadcast(uni_nn), "token")
             .crossJoin(F.broadcast(unk))
             .crossJoin(F.broadcast(vocab))
             .select("prev", "token",
                     (lam * p_big + (1.0 - lam) * p_uni).alias("_p_pair")))

    pairs = (docs.select(id_col,
                         F.explode(_bigram_pairs(text_col)).alias("p"))
             .select(id_col, F.col("p.prev").alias("prev"),
                     F.col("p.tok").alias("token")))
    scored = (pairs
              .join(score, ["prev", "token"], "left")
              .join(F.broadcast(uni_nn), "token", "left")
              .crossJoin(F.broadcast(unk)))
    p = F.when(F.col("prev").isNull(), p_uni) \
        .otherwise(F.col("_p_pair"))
    dec = F.round(F.log(p), 6).cast("decimal(24,6)")
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("ntok"),
                 (-F.sum(dec)).cast("double").alias("nll"))
            .select(id_col, "ntok",
                    F.round("nll", 6).alias("nll"),
                    F.round(F.exp(F.col("nll") / F.col("ntok")), 6)
                    .alias("ppl")))


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII match counts under the scalars.REDACT_PATTERNS
    chain — the audit table a corpus scrub produces alongside the
    redacted text. Counts are taken on the PROGRESSIVELY-REDACTED
    text, pattern by pattern in chain order, so they equal exactly
    what redact() replaces (counting every pattern against the raw
    text would double-count spans an earlier rule already consumed).
    Pure codegen regexp_extract_all/regexp_replace stages — no UDF,
    no shuffle, zero Exchange."""
    from webalizer_spark.functions.scalars import REDACT_PATTERNS

    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = {}
    for placeholder, pattern in REDACT_PATTERNS:
        name = "n_" + placeholder.strip("<>").lower()
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pattern),
                                                   F.lit(0)))
        cur = F.regexp_replace(cur, pattern, placeholder)
    total = None
    cols = [F.col(id_col)]
    for name, c in counts.items():
        c = c.cast("bigint")
        cols.append(c.alias(name))
        total = c if total is None else total + c
    return docs.select(*cols, total.alias("n_pii"),
                       (total > 0).alias("has_pii"))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Corpus version diff — the audit a dataset release pipeline runs
    between two snapshots: one row per doc that was added, removed or
    changed (unchanged docs emit nothing). Both sides project to
    (id, md5(text)) FIRST, so only ids and 16-byte hashes cross the
    full-outer join's Exchange — text never shuffles at any scale;
    NULL text hashes as the empty string, so a present-but-NULL row is
    distinct from an absent row."""
    def h(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(alias))

    j = h(old, "_oh").join(h(new, "_nh"), id_col, "full_outer")
    change = (F.when(F.col("_oh").isNull(), "added")
              .when(F.col("_nh").isNull(), "removed")
              .when(F.col("_oh") != F.col("_nh"), "changed"))
    return (j.withColumn("change", change)
            .where(F.col("change").isNotNull())
            .select(id_col, "change"))


def html_to_text(html: Column) -> Column:
    """HTML -> text extraction, the first step of a web-corpus
    pipeline (the engine-native core of what WET extractors do):

    - drop <script>/<style> elements WITH their content, and comments
    - block-level closers/breaks (</p> </div> </li> </h1..6> <br>)
      become newlines; every other tag strips to nothing
    - decode the common entities (&amp; &lt; &gt; &quot; &#39; &nbsp;)
      — &amp; LAST, so '&amp;lt;' decodes to the literal '&lt;' and
      double-decoding cannot resurrect markup
    - per-line whitespace collapse + trim, empty lines dropped

    Pure codegen regexp stages plus an array HOF for line cleanup —
    no UDF, no shuffle. Case-insensitive, dotall where content spans
    lines."""
    t = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>",
                         " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|h[1-6]|tr|title)\s*>|<br\s*/?>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    lines = F.transform(F.split(t, "\n"),
                        lambda ln: F.trim(F.regexp_replace(ln, r"\s+", " ")))
    return F.array_join(F.filter(lines, lambda ln: ln != ""), "\n")


def dedup_lines(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """WITHIN-document line dedup (the Dolma/ccnet paragraph rule's
    in-doc form): each line keeps only its FIRST occurrence inside the
    document; later repeats drop (navigation chrome, repeated footers,
    chat-log echo). Pure per-row HOFs — the line array never leaves
    its row, zero shuffle, zero Exchange. Returns the rebuilt text
    plus kept/dropped counts; NULL text behaves as empty."""
    # two-step projection: the output column reuses the INPUT's name,
    # and Spark 4's lateral column alias resolution would rebind any
    # later same-select reference to text_col against the NEW alias
    # (silently recomputing sizes over the rebuilt text — caught by
    # the oracle). All expressions below reference _lines instead.
    base = docs.select(
        F.col(id_col),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        .alias("_lines"))
    la = F.col("_lines")
    kept = F.filter(la, lambda ln, i: F.array_position(la, ln) == i + 1)
    return base.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).cast("bigint").alias("n_kept"),
        (F.size(la) - F.size(kept)).cast("bigint").alias("n_dropped"))


def char_entropy(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document Shannon character entropy in bits — the cheap
    gibberish/repetition signal (natural text sits ~4 bits/char;
    'aaaa...' is 0; uniform random base64 approaches 6): H = -sum
    p_c * log2(p_c) over the document's character distribution.

    Zero-shuffle per-row HOFs: characters enumerate via substring
    (NOT split(col, ''), whose empty-tail behavior differs between
    engines), counts come from filter-size over the SORTED distinct
    set, and the fold runs in sorted char order so the floating sum
    is identical in any engine that evaluates the same IEEE ops in
    the same sequence. Rounded to 6dp; empty/NULL text scores 0."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    chars = F.transform(F.sequence(F.lit(1), n),
                        lambda i: F.substring(txt, i, 1))
    chars = F.when(n > 0, chars).otherwise(F.array().cast("array<string>"))
    # natural log + one shared literal divisor: log2() itself may be
    # correctly-rounded in one engine and ln(x)/ln(2) in another — an
    # ulp split the 6dp round could expose; ln agrees bit-for-bit
    ln2 = 0.6931471805599453

    def term(run):
        p = run.cast("double") / n.cast("double")
        return p * F.log(p)

    # counts via ONE run-length fold over the sorted chars (the
    # filter-per-distinct-char formulation was O(len * distinct) per
    # row); each run completes in sorted-char order, so the float-sum
    # SEQUENCE is identical to folding the sorted distinct set — the
    # DuckDB oracle is unchanged
    folded = F.aggregate(
        F.array_sort(chars),
        F.named_struct(F.lit("prev"), F.lit(None).cast("string"),
                       F.lit("run"), F.lit(0),
                       F.lit("nats"), F.lit(0.0)),
        lambda acc, c: F.named_struct(
            F.lit("prev"), c,
            F.lit("run"),
            F.when(acc["prev"].eqNullSafe(c), acc["run"] + 1).otherwise(1),
            F.lit("nats"),
            F.when(acc["prev"].eqNullSafe(c) | acc["prev"].isNull(),
                   acc["nats"]).otherwise(acc["nats"] + term(acc["run"]))),
        lambda acc: F.when(acc["run"] > 0,
                           acc["nats"] + term(acc["run"]))
        .otherwise(acc["nats"]))
    nats = folded
    return docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars_txt"),
        F.round(F.coalesce(F.when(n > 0, -nats / F.lit(ln2)),
                           F.lit(0.0)), 6).alias("entropy_bits"))


def split_sentences(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sentence segmentation — the unit C4/CCNet rules actually speak
    in: runs of non-terminal characters up to a [.!?]+ burst form one
    sentence (punctuation kept), a trailing unterminated fragment is
    its own sentence, whitespace trims, empties drop. One
    regexp_extract_all + HOF cleanup per row, zero shuffle; the
    pattern uses NO lookarounds so it runs identically under Java
    regex and RE2. Output: (id, sent_idx 0-based, sentence, n_words
    whitespace-word count)."""
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                 F.lit(r"[^.!?]*[.!?]+|[^.!?]+$"),
                                 F.lit(0)),
            lambda s: F.trim(s)),
        lambda s: s != "")
    e = docs.select(F.col(id_col),
                    F.posexplode(sents).alias("sent_idx", "sentence"))
    n_words = F.size(F.filter(F.split(F.col("sentence"), r"\s+"),
                              lambda t: t != ""))
    return e.select(id_col, "sent_idx", "sentence",
                    n_words.cast("bigint").alias("n_words"))


def chunk_by_sentences(docs: DataFrame, max_tokens: int = 64,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Sentence-aware chunking: greedily pack whole SENTENCES into
    chunks of at most ``max_tokens`` whitespace words — the
    RAG/embedding-era sibling of sampling.chunk_documents, which cuts
    at fixed token offsets mid-sentence. A sentence longer than the
    budget becomes its own oversized chunk (never split). The greedy
    fold is inherently sequential PER DOCUMENT but each document's
    fold runs inside its own row — one HOF aggregate, zero shuffle
    before the final narrow posexplode."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                 F.lit(r"[^.!?]*[.!?]+|[^.!?]+$"),
                                 F.lit(0)),
            lambda s: F.trim(s)),
        lambda s: s != "")

    def nw(s):
        return F.size(F.filter(F.split(s, r"\s+"), lambda t: t != ""))

    empty = F.array().cast("array<string>")
    folded = F.aggregate(
        sents,
        F.named_struct(F.lit("chunks"), empty,
                       F.lit("cur"), F.lit(""),
                       F.lit("cur_n"), F.lit(0)),
        lambda acc, s: (lambda n: F.named_struct(
            F.lit("chunks"),
            F.when((acc["cur"] != "") & (acc["cur_n"] + n > max_tokens),
                   F.concat(acc["chunks"], F.array(acc["cur"])))
            .otherwise(acc["chunks"]),
            F.lit("cur"),
            F.when((acc["cur"] != "") & (acc["cur_n"] + n <= max_tokens),
                   F.concat_ws(" ", acc["cur"], s)).otherwise(s),
            F.lit("cur_n"),
            F.when((acc["cur"] != "") & (acc["cur_n"] + n <= max_tokens),
                   acc["cur_n"] + n).otherwise(n)))(nw(s)),
        lambda acc: F.when(acc["cur"] == "", acc["chunks"])
        .otherwise(F.concat(acc["chunks"], F.array(acc["cur"]))))
    e = (docs.select(F.col(id_col), folded.alias("_chunks"))
         .select(F.col(id_col),
                 F.posexplode("_chunks").alias("chunk_idx", "chunk_text")))
    return e.select(id_col, "chunk_idx", "chunk_text",
                    nw(F.col("chunk_text")).cast("bigint").alias("n_tokens"))


def column_top_values(df: DataFrame, columns: list[str],
                      k: int = 5) -> DataFrame:
    """Top-k most frequent values per column (the profile_table
    companion a data-quality sweep prints for CATEGORICAL columns):
    one narrow struct-array explode stacks the requested columns into
    (column_name, value) rows, ONE groupBy counts them, and the
    ranking window runs over the COUNTS table partitioned by column —
    never over the input. Values render as strings (NULL stays NULL
    and counts like any other value). Deterministic ties: count desc,
    value asc (NULLS FIRST, Spark's asc default — mirrored in the
    oracle). Meant for columns whose distinct count (see
    profile_table) is bounded; on an id-like column the counts table
    is corpus-sized and the per-column window becomes the cost."""
    from pyspark.sql import Window

    if not columns:
        raise ValueError("column_top_values needs at least one column")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    entries = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(c).cast("string").alias("value"))
        for c in columns])).alias("e")
    counts = (df.select(entries).select("e.*")
              .groupBy("column_name", "value")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("column_name").orderBy(
        F.col("cnt").desc(), F.col("value").asc())
    return (counts.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("column_name", "value",
                    F.col("cnt").cast("bigint").alias("cnt"),
                    F.col("rnk").cast("int").alias("rnk")))
