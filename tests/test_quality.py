from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.quality import (
    bloom_contaminated_ids,
    bloom_words,
    contaminated_ids,
    decontaminate,
    ngram_repetition,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ngram_repetition_known_values(spark):
    df = _docs(spark, [
        (1, "a b a b a b"),        # bigrams: ab ba ab ba ab -> top ab=3/5
        (2, "x y z w"),            # all distinct -> 0 dup, top 1/3
        (3, "q q q q q"),          # qq x4 -> dup 1.0, top 1.0
        (4, "one"),                # shorter than n -> no grams
        (5, "t t"),                # single gram -> dup 0, top 1.0
    ])
    out = {r["doc_id"]: r for r in ngram_repetition(df, n=2).collect()}
    assert out[1]["ngrams"] == 5
    assert out[1]["dup_ngram_frac"] == 0.6        # 1 - 2/5
    assert out[1]["top_ngram_frac"] == 0.6        # 3/5
    assert out[2]["dup_ngram_frac"] == 0.0
    assert round(out[2]["top_ngram_frac"], 6) == round(1 / 3, 6)
    assert out[3]["dup_ngram_frac"] == 0.75       # 1 - 1/4
    assert out[3]["top_ngram_frac"] == 1.0
    assert out[4]["ngrams"] == 0
    assert out[4]["dup_ngram_frac"] == 0.0
    assert out[4]["top_ngram_frac"] == 0.0
    assert out[5]["dup_ngram_frac"] == 0.0
    assert out[5]["top_ngram_frac"] == 1.0


def test_ngram_repetition_is_shuffle_free(spark):
    """The 100 TB contract: per-row HOF metrics, no Exchange anywhere —
    an explode+groupBy formulation would shuffle every gram row."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = ngram_repetition(df, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decontaminate_semantics(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely different document with no overlap at all"),
        (3, "prefix words then the quick brown fox jumps over the lazy"),
        (4, "short doc"),
    ])
    bench = _docs(spark, [
        (100, "the quick brown fox jumps over the lazy"),
    ]).select("text")
    bad = {r["doc_id"] for r in
           contaminated_ids(docs, bench, n=8).collect()}
    assert bad == {1, 3}          # both contain the 8-token bench span
    kept = {r["doc_id"] for r in
            decontaminate(docs, bench, n=8).collect()}
    assert kept == {2, 4}
    # n larger than every doc -> nothing flagged, nothing dropped
    assert contaminated_ids(docs, bench, n=50).count() == 0
    assert decontaminate(docs, bench, n=50).count() == 4


def test_decontaminate_joins_are_broadcast(spark):
    """Neither join may shuffle the corpus: benchmark grams broadcast
    into the semi join, contaminated ids broadcast into the anti join.
    The only Exchange allowed is the tiny ids distinct."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.split("text", " ")
    bench = (docs.filter(F.col("doc_id") % 17 == 3)
             .select(F.concat_ws(" ", F.slice(toks, 1, 8)).alias("text")))
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "gram_key" not in line, line  # corpus grams never shuffle
    # every benchmark source doc flags itself
    bad = {r["doc_id"] for r in contaminated_ids(docs, bench, 8).collect()}
    src = {r["doc_id"] for r in
           docs.filter((F.col("doc_id") % 17 == 3)
                       & (F.size(toks) >= 8)).collect()}
    assert src and src <= bad


def test_bloom_decontaminate_equals_exact(spark):
    """Bloom prefilter + exact confirm must equal the exact operator —
    including at a DELIBERATELY tiny bitmap (m=64, k=2: false positives
    guaranteed on this corpus) where only the confirm join keeps the
    answer exact."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.split("text", " ")
    bench = (docs.filter(F.col("doc_id") % 17 == 3)
             .select(F.concat_ws(" ", F.slice(toks, 1, 8)).alias("text")))
    exact = {r["doc_id"] for r in
             contaminated_ids(docs, bench, n=8).collect()}
    assert exact  # never vacuous: every bench source doc flags itself
    for m_bits, k in ((1 << 16, 3), (64, 2)):
        got = {r["doc_id"] for r in
               bloom_contaminated_ids(docs, bench, n=8, m_bits=m_bits,
                                      k=k).collect()}
        assert got == exact, (m_bits, k)


def test_bloom_words_properties(spark):
    """Bitmap build: no false negatives ever; validation raises; empty
    key set -> all-zero bitmap -> zero candidates."""
    import pytest

    keys = spark.createDataFrame(
        [(i * 7919,) for i in range(200)], "gram_key bigint")
    words = bloom_words(keys, m_bits=1 << 10, k=3)
    assert len(words) == (1 << 10) // 64
    from webalizer_spark.operators.quality import _bloom_hit
    hits = keys.select(_bloom_hit(F.col("gram_key"), words, 3)
                       .alias("h")).collect()
    assert all(r["h"] for r in hits)  # membership is never missed
    empty = bloom_words(keys.limit(0), m_bits=1 << 10, k=3)
    assert set(empty) == {0}
    with pytest.raises(ValueError):
        bloom_words(keys, m_bits=100, k=3)       # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_words(keys, m_bits=1 << 10, k=0)   # k out of range


def test_bloom_confirm_join_never_ships_text(spark):
    """Plan shape: the corpus reaches the confirm join as (doc_id,
    gram_key) only — no text column in any Exchange — and the Bloom
    test is a JVM literal-array filter, no Python UDF stage."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.split("text", " ")
    bench = (docs.filter(F.col("doc_id") % 17 == 3)
             .select(F.concat_ws(" ", F.slice(toks, 1, 8)).alias("text")))
    plan = bloom_contaminated_ids(docs, bench, n=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_dedup_spans_semantics(spark):
    """C4-style span dedup on hand-built docs: the FIRST occurrence
    (by doc_id, span_idx) survives, later copies vanish — within a doc
    and across docs — the <n tail always survives, and docs shorter
    than n pass through untouched."""
    from webalizer_spark.operators.quality import (
        dedup_spans,
        duplicate_spans,
    )

    df = _docs(spark, [
        # doc 1: span "a b" repeated twice + tail "t"
        (1, "a b a b t"),
        # doc 2: copies doc 1's span -> removed here, kept there
        (2, "a b z z"),
        # doc 3: unique spans only
        (3, "p q r s"),
        # doc 4: shorter than n
        (4, "x"),
    ])
    rm = {(r["doc_id"], r["span_idx"])
          for r in duplicate_spans(df, n=2).collect()}
    assert rm == {(1, 1), (2, 0)}
    out = {r["doc_id"]: r for r in dedup_spans(df, n=2).collect()}
    assert out[1]["text"] == "a b t"
    assert out[1]["n_spans_removed"] == 1
    assert out[2]["text"] == "z z"
    assert out[3]["text"] == "p q r s"
    assert out[3]["n_spans_removed"] == 0
    assert out[4]["text"] == "x"

    # all-spans-removed doc rebuilds to the empty string, not NULL
    df2 = _docs(spark, [(1, "a b"), (2, "a b")])
    out2 = {r["doc_id"]: r["text"]
            for r in dedup_spans(df2, n=2).collect()}
    assert out2 == {1: "a b", 2: ""}


def test_duplicate_spans_shuffles_keys_not_text(spark):
    """The candidate shuffle carries only (id, idx, 16-hex key) — the
    corpus text column never enters an Exchange on the decision path."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from webalizer_spark.operators.quality import duplicate_spans
    plan = duplicate_spans(df, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_lm_perplexity_known_values(spark):
    """Unigram LM on a 2-doc corpus, checked against hand-computed
    add-alpha probabilities, including the UNK fallback for a token
    the LM never saw."""
    import math

    from webalizer_spark.operators.quality import (
        lm_perplexity,
        unigram_logprobs,
    )

    train = _docs(spark, [(1, "a a b"), (2, "b c")])
    # counts: a=2 b=2 c=1, total=5, vocab=3; denom = 5 + .5*4 = 7
    lm = unigram_logprobs(train, alpha=0.5)
    got = {r["token"]: r["logp"] for r in lm.collect()}
    assert abs(got["a"] - math.log(2.5 / 7)) < 1e-12
    assert abs(got["c"] - math.log(1.5 / 7)) < 1e-12
    assert abs(got[None] - math.log(0.5 / 7)) < 1e-12

    score = _docs(spark, [(9, "a c zz")])      # zz is OOV -> UNK logp
    row = lm_perplexity(score, lm=lm).collect()[0]
    expect = -(round(math.log(2.5 / 7), 6) + round(math.log(1.5 / 7), 6)
               + round(math.log(0.5 / 7), 6))
    assert row["ntok"] == 3
    assert abs(row["nll"] - round(expect, 6)) < 1e-9
    assert abs(row["ppl"] - round(math.exp(expect / 3), 6)) < 1e-9


def test_lm_perplexity_no_text_through_exchange(spark):
    """The scoring path explodes tokens WITHOUT the text column and
    broadcasts the LM: no Exchange carries corpus text, and the per-doc
    collapse is the only wide stage."""
    from webalizer_spark.operators.quality import lm_perplexity
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = lm_perplexity(df)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_length_stats_exact_and_sketch(spark):
    """Exact tier against hand-computed interpolated percentiles; the
    t-digest sketch tier (the 100 TB path) within tolerance of exact —
    the same exact-vs-sketch split as the HLL distinct tier."""
    from webalizer_spark.operators.quality import length_stats

    rows = [(i, " ".join(["w"] * ((i % 10) + 1)), "s") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = length_stats(df, by="source").collect()[0]
    # ntok values: 1..10 twice -> p50 = 5.5, p90 = 9.1, mean = 5.5
    assert out["n_docs"] == 20 and out["total_tok"] == 110
    assert out["mean_tok"] == 5.5
    assert out["p50_tok"] == 5.5
    assert abs(out["p90_tok"] - 9.1) < 1e-9

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {r["source"]: r for r in length_stats(docs).collect()}
    sk = {r["source"]: r for r in
          length_stats(docs, exact=False).collect()}
    assert set(exact) == set(sk)
    for s, e in exact.items():
        for c in ("p50_tok", "p90_tok", "p99_tok"):
            assert abs(sk[s][c] - e[c]) <= max(1.0, 0.05 * e[c]), (s, c)


def test_mixing_weights_semantics(spark):
    """Mixture planning rules: un-normalized priorities normalize to
    shares; the max-epochs cap binds for over-demanded small sources
    (realized < desired); sources absent from targets mix at zero; and
    realized shares sum to 1."""
    from webalizer_spark.operators.quality import mixing_weights

    docs = spark.createDataFrame(
        [(i, "tok " * (10 if i % 3 == 0 else 500)
          + "end", "small" if i % 3 == 0 else
          ("untargeted" if i % 3 == 1 else "big"))
         for i in range(30)],
        "doc_id long, text string, source string")
    targets = spark.createDataFrame(
        [("small", 3.0), ("big", 1.0)],   # un-normalized priorities
        "source string, target_share double")
    out = {r["source"]: r.asDict()
           for r in mixing_weights(docs, targets, budget_tokens=10_000,
                                   max_epochs=2.0).collect()}
    assert abs(out["small"]["target_share"] - 0.75) < 1e-9
    assert abs(out["big"]["target_share"] - 0.25) < 1e-9
    # small: desired 7500 tokens >> available (10 docs * 11 tok) -> cap
    assert out["small"]["epochs"] == 2.0
    assert out["small"]["realized_tok"] == 2 * out["small"]["available_tok"]
    assert out["small"]["realized_tok"] < out["small"]["desired_tok"]
    # big is under-demanded -> uncapped, realized == desired (rounded)
    assert out["big"]["epochs"] < 2.0
    assert abs(out["big"]["realized_tok"] - out["big"]["desired_tok"]) <= 1
    # untargeted mixes at zero
    assert out["untargeted"]["target_share"] == 0.0
    assert out["untargeted"]["epochs"] == 0.0
    assert out["untargeted"]["realized_tok"] == 0
    assert abs(sum(r["realized_share"] for r in out.values()) - 1.0) < 1e-6


def test_pagerank_matches_dense_reference(spark):
    """PageRank on a small graph matches a dense numpy power iteration
    with dangling redistribution (tolerance covers the operator's 6dp
    contribution rounding), total mass stays ~1, and a dangling node
    still receives and donates rank."""
    import numpy as np

    from webalizer_spark.operators.quality import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "a"), ("c", "e")]          # e: dangling (no out-edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iters=8).collect()}

    names = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    out = np.zeros(n)
    m = np.zeros((n, n))
    for s, d in edges:
        m[idx[d], idx[s]] += 1
        out[idx[s]] += 1
    col = np.divide(m, out, out=np.zeros_like(m), where=out > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        dang = r[out == 0].sum()
        r = (1 - 0.85) / n + 0.85 * (col @ r + dang / n)
    for name in names:
        assert abs(got[name] - r[idx[name]]) < 5e-5, name
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert got["e"] > (1 - 0.85) / n      # dangling node still scores


def test_blocklist_filter_and_stats(spark):
    """Word mode: occurrences (not distinct terms) count, case-folded;
    filter keeps frac <= threshold inline with zero Exchange and no
    join. Substring mode flags any term occurring inside the text."""
    from webalizer_spark.operators.quality import (
        blocklist_filter,
        blocklist_stats,
    )

    docs = _docs(spark, [
        (1, "Bad bad apple pie"),          # 2/4 hits, case-folded
        (2, "clean text entirely"),
        (3, "one bad token here now"),     # 1/5
        (4, "embedded badge word"),        # 'bad' substring, not a token
    ])
    stats = {r["doc_id"]: r for r in
             blocklist_stats(docs, ["bad"]).collect()}
    assert stats[1]["blocked_tokens"] == 2 and stats[1]["blocked_frac"] == 0.5
    assert stats[2]["blocked_tokens"] == 0
    assert stats[3]["blocked_frac"] == 0.2
    assert stats[4]["blocked_tokens"] == 0     # token mode: no substring hit

    assert {r["doc_id"] for r in
            blocklist_filter(docs, ["bad"]).collect()} == {2, 4}
    assert {r["doc_id"] for r in
            blocklist_filter(docs, ["bad"], max_frac=0.3).collect()} \
        == {2, 3, 4}
    # substring mode catches the embedded term AND case-folds: a doc
    # whose only occurrence is upper-case must still be dropped
    assert {r["doc_id"] for r in
            blocklist_filter(docs, ["bad"], substring=True).collect()} == {2}
    up = _docs(spark, [(9, "BADWORD here"), (10, "fine")])
    assert {r["doc_id"] for r in
            blocklist_filter(up, ["badword"], substring=True).collect()} \
        == {10}
    s9 = blocklist_stats(up, ["badword"], substring=True).collect()
    assert {r["doc_id"]: r["blocked_frac"] for r in s9} == {9: 1.0, 10: 0.0}

    big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = blocklist_filter(big, ["slow", "hash"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_normalize_text_rules(spark):
    """NFC composes combining sequences, NFKC folds compatibility forms,
    controls strip while tab/newline collapse as whitespace, `changed`
    marks only rewritten rows, NULL text passes through, and unknown
    forms refuse."""
    import pytest

    from webalizer_spark.operators.quality import normalize_text

    docs = spark.createDataFrame(
        [(1, "éclair  stuffed"),        # combining acute + ws run
         (2, "clean text"),
         (3, "ctl\x01\x02here"),
         (4, "ﬁne ligature"),            # ﬁ — NFKC-only fold
         (5, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["text"] == "éclair stuffed" and out[1]["changed"]
    assert out[2]["text"] == "clean text" and not out[2]["changed"]
    assert out[3]["text"] == "ctlhere" and out[3]["changed"]
    assert out[4]["text"] == "ﬁne ligature"    # NFC keeps ligature
    assert not out[4]["changed"]
    assert out[5]["text"] is None and not out[5]["changed"]

    nfkc = {r["doc_id"]: r["text"]
            for r in normalize_text(docs, form="NFKC").collect()}
    assert nfkc[4] == "fine ligature"               # ligature folds

    # order matters: NFKC folds NBSP INTO whitespace, and because the
    # form runs BEFORE the collapse, the introduced space collapses too
    nb = spark.createDataFrame([(21, "a  b"), (22, "c1ctl")],
                               "doc_id long, text string")
    nbo = {r["doc_id"]: r for r in
           normalize_text(nb, form="NFKC").collect()}
    assert nbo[21]["text"] == "a b" and nbo[21]["changed"]
    # C1 controls (U+0085 NEL and friends) strip per the C0/C1 contract
    assert nbo[22]["text"] == "c1ctl" and nbo[22]["changed"]

    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(docs, form="NFX")


def test_quantile_bins_semantics(spark):
    """Quartile bins on a known 1..100 score column: ~25 per bin with
    boundary scores binned by the strict-> rule; the sketch tier lands
    within one bin of exact; n_bins<2 refuses; plan has no Window."""
    import pytest

    from webalizer_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)],
                               "doc_id long, s double")
    out = {r["doc_id"]: r["bin"] for r in
           quantile_bins(df, "s", n_bins=4).collect()}
    # thresholds (interpolated): 25.75 / 50.5 / 75.25
    assert out[25] == 1 and out[26] == 2
    assert out[50] == 2 and out[51] == 3
    assert out[75] == 3 and out[76] == 4 and out[100] == 4
    from collections import Counter
    sizes = Counter(out.values())
    assert set(sizes) == {1, 2, 3, 4}
    assert all(24 <= v <= 26 for v in sizes.values())

    approx = {r["doc_id"]: r["bin"] for r in
              quantile_bins(df, "s", n_bins=4, exact=False).collect()}
    assert all(abs(approx[k] - out[k]) <= 1 for k in out)

    with pytest.raises(ValueError, match="n_bins"):
        quantile_bins(df, "s", n_bins=1)

    # NULL score -> NULL bin (not silently band 1)
    withnull = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)],
        "doc_id long, s double")
    nb = {r["doc_id"]: r["bin"] for r in
          quantile_bins(withnull, "s", n_bins=2).collect()}
    assert nb[4] is None and nb[1] == 1 and nb[3] == 2

    plan = quantile_bins(df, "s")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan, plan


def test_normalize_text_idempotent(spark):
    """Normalization is a projection: applying the pass to its own
    output changes nothing (NFC and NFKC are idempotent, the collapse
    and strip leave no residue), so changed=False on every second-pass
    row."""
    from webalizer_spark.operators.quality import normalize_text

    docs = spark.createDataFrame(
        [(1, "éclair  x\x01 ligature ﬁ end\t"),
         (2, "plain"),
         (3, None)],
        "doc_id long, text string")
    for form in ("NFC", "NFKC"):
        once = normalize_text(docs, form=form)
        twice = normalize_text(once, form=form)
        rows = {r["doc_id"]: r for r in twice.collect()}
        assert not any(r["changed"] for r in rows.values())
        first = {r["doc_id"]: r["text"] for r in once.collect()}
        assert {k: v["text"] for k, v in rows.items()} == first


def test_tf_idf_min_df_prunes_hapax(spark):
    """min_df drops terms below the document-frequency floor BEFORE the
    weight join (the Zipf-tail prune): hapax terms vanish at min_df=2
    while shared terms keep exact tf/df; idf is the smoothed form."""
    import math

    from webalizer_spark.operators.quality import tf_idf

    docs = _docs(spark, [(1, "apple banana apple"),
                         (2, "banana cherry"),
                         (3, "banana")])
    out = {(r["doc_id"], r["term"]): r
           for r in tf_idf(docs, min_df=2).collect()}
    assert all(t == "banana" for _, t in out)      # apple/cherry pruned
    assert out[(1, "banana")]["tf"] == 1 and out[(1, "banana")]["df"] == 3
    expect = round(1 * (math.log((3 + 1) / (3 + 1)) + 1.0), 6)
    assert out[(3, "banana")]["tfidf"] == expect   # idf = 1 at df == N

    allterms = {r["term"] for r in tf_idf(docs, min_df=1).collect()}
    assert allterms == {"apple", "banana", "cherry"}


def test_lm_perplexity_rejects_lm_without_unk(spark):
    """Round-5 advice: a caller-supplied lm with no NULL-token row used
    to crossJoin an empty frame and silently drop every doc; it must
    raise instead."""
    import pytest

    from webalizer_spark.operators.quality import lm_perplexity

    bad_lm = spark.createDataFrame(
        [("a", 0.5), ("b", -1.0)], "token string, logp double")
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="UNK"):
        lm_perplexity(docs, lm=bad_lm)


def test_dedup_substrings_any_length_semantics(spark):
    """ExactSubstr keeper semantics on a hand-checked corpus: the
    corpus-first occurrence of a repeat survives intact; later
    occurrences vanish WHOLESALE whatever their length (any-length, not
    span-aligned); intra-doc repeats drop their second copy; docs
    shorter than min_len, NULL docs and clean docs pass through."""
    from webalizer_spark.operators.quality import dedup_substrings

    rows = [
        (1, "a b x1 x2 x3 x4 x5 x6 c d"),   # first occurrence (6-token run)
        (2, "q x1 x2 x3 x4 x5 x6 r"),        # cross-doc repeat -> removed
        (3, "x1 x2 x3 x4 x5 x6 m x1 x2 x3 x4 x5 x6"),  # both covered (keeper=1)
        (4, "no dups here at all"),
        (5, None),
        (6, "x1 x2 x3"),                     # shorter than min_len
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in dedup_substrings(df, min_len=4).collect()}
    assert out[1]["text"] == rows[0][1] and out[1]["n_tokens_removed"] == 0
    # the repeat is 6 tokens long with min_len=4: ALL 6 removed
    assert out[2]["text"] == "q r" and out[2]["n_tokens_removed"] == 6
    assert out[3]["text"] == "m" and out[3]["n_tokens_removed"] == 12
    assert out[4]["n_tokens_removed"] == 0
    assert out[5]["text"] is None and out[5]["n_tokens_removed"] == 0
    assert out[6]["text"] == "x1 x2 x3" and out[6]["n_tokens_removed"] == 0


def test_dedup_substrings_intra_doc_keeper(spark):
    """A repeat that exists ONLY within one doc keeps its first copy."""
    from webalizer_spark.operators.quality import dedup_substrings

    df = spark.createDataFrame(
        [(7, "k1 k2 k3 k4 z k1 k2 k3 k4")], "doc_id int, text string")
    row = dedup_substrings(df, min_len=4).collect()[0]
    assert row["text"] == "k1 k2 k3 k4 z"
    assert row["n_tokens_removed"] == 4


def test_dedup_substrings_no_text_through_anchor_exchange(spark):
    """The gram-key groupBy is the anchor Exchange: it must carry only
    (id, int, 16-hex key) — never the text column (the 100 TB
    constraint for sliding-window dedup)."""
    from webalizer_spark.operators.quality import dedup_substrings

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = dedup_substrings(df, min_len=16)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_dsir_prefers_target_like_docs(spark):
    """Docs resembling the target distribution must out-weigh noise:
    the importance log-ratio is positive exactly on target-heavy
    buckets. Held-out target-like docs (NOT in the target set) score
    above noise docs."""
    from webalizer_spark.operators.quality import (
        dsir_logweights,
        dsir_sample,
    )

    rows = []
    for i in range(40):
        if i % 4 == 0:
            rows.append((i, "alpha beta gamma delta alpha beta"))
        elif i % 4 == 1:  # target-like but NOT in the target set
            rows.append((i, "alpha beta gamma delta"))
        else:
            rows.append((i, f"noise{i} junk{i} filler{i} blob{i}"))
    docs = _docs(spark, rows)
    target = docs.filter(F.col("doc_id") % 4 == 0)
    lw = {r["doc_id"]: r["logw"]
          for r in dsir_logweights(docs, target).collect()}
    assert set(lw) == set(range(40))
    like = [lw[i] for i in range(40) if i % 4 == 1]
    noise = [lw[i] for i in range(40) if i % 4 >= 2]
    assert min(like) > max(noise), (like, noise)
    # Gumbel-top-k: deterministic, bounded, and score = logw + gumbel
    top = dsir_sample(docs, target, k=10).collect()
    assert len(top) == 10
    assert top == dsir_sample(docs, target, k=10).collect()
    import hashlib
    import math
    for r in top:
        h = int(hashlib.md5(str(r["doc_id"]).encode())
                .hexdigest()[:13], 16)
        g = -math.log(-math.log((h + 1) / float((1 << 52) + 2)))
        assert abs(r["score"] - (r["logw"] + g)) < 2e-6, r


def test_dsir_scoring_pass_is_zero_shuffle(spark):
    """The 100 TB contract: model FITTING aggregates to <=B rows
    (bounded, collected once); SCORING is a per-row HOF fold over a
    literal ratio array — the returned frame's plan has no Exchange
    and no Python stage."""
    from webalizer_spark.operators.quality import dsir_logweights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("doc_id") % 29 == 7)
    plan = dsir_logweights(docs, target)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_c4_line_filter_rules(spark):
    """Every C4 rule on one hand-built doc: terminal punct, min words,
    blocklist, brace, and the doc-level min_lines drop."""
    from webalizer_spark.operators.quality import c4_line_filter

    import pytest

    good = "one two three four five."
    df = _docs(spark, [
        (1, "\n".join([
            good,                              # kept
            "one two three four five",         # no terminal punct
            "short line here.",                # < 5 words
            "download our JavaScript bundle now!",   # blocklist (fold)
            "function f() { return 1; }.",     # brace
            'he said "hello there my friend."',      # kept (ends .)
            "why not ask a question?",         # kept (ends ?)
        ])),
        (2, "\n".join([good, good])),          # only 2 kept -> dropped
    ])
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert set(out) == {1}
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 4
    assert out[1]["text"].split("\n") == [
        good,
        'he said "hello there my friend."',
        "why not ask a question?",
    ]
    with pytest.raises(ValueError):
        c4_line_filter(df, min_words=0)


def test_c4_line_filter_is_zero_shuffle(spark):
    from webalizer_spark.operators.quality import c4_line_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = c4_line_filter(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_profile_table_semantics(spark):
    """profile_table: null counting, exact distincts, the min/max
    render policy (double -> DECIMAL(18,6) string), column subset,
    unknown-column and empty refusals, and the approx tier staying
    within HLL tolerance."""
    import pytest

    from webalizer_spark.operators.quality import profile_table

    rows = [(1, 2.5, "a"), (2, None, "b"), (3, 0.1234567, "b"),
            (None, 2.5, None)]
    df = spark.createDataFrame(rows, "id bigint, score double, tag string")
    prof = {r["column_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "score", "tag"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["id"]["n_nulls"] == 1 and prof["id"]["n_distinct"] == 3
    assert prof["score"]["n_nulls"] == 1 and prof["score"]["n_distinct"] == 2
    # 7th decimal rounds away under the 6dp policy
    assert prof["score"]["min_val"] == "0.123457"
    assert prof["score"]["max_val"] == "2.500000"
    assert prof["tag"]["min_val"] == "a" and prof["tag"]["max_val"] == "b"

    sub = profile_table(df, columns=["tag"]).collect()
    assert len(sub) == 1 and sub[0]["column_name"] == "tag"

    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, columns=["nope"])
    with pytest.raises(ValueError, match="at least one"):
        profile_table(df, columns=[])

    approx = {r["column_name"]: r
              for r in profile_table(df, exact=False).collect()}
    for c in prof:
        exact_nd, approx_nd = prof[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(approx_nd - exact_nd) <= max(1, int(0.2 * exact_nd))


def test_profile_table_single_aggregate_plan(spark):
    """The exact=False tier must compile to ONE aggregate pass with no
    Expand (the multi-count_distinct Expand is the thing the approx
    tier exists to avoid at scale)."""
    from webalizer_spark.operators.quality import profile_table

    df = spark.range(100).selectExpr("id", "id % 7 AS a",
                                     "CAST(id % 3 AS STRING) AS b")
    plan = profile_table(df, exact=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = profile_table(df, exact=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" in exact_plan  # documents the exact-tier trade


def test_bigram_perplexity_semantics(spark):
    """lm_perplexity_bigram vs a from-scratch numpy re-derivation on a
    tiny corpus: doc-initial tokens score unigram-only, seen bigrams
    get the interpolated conditional, unseen bigrams fall to the
    smoothing floor; lam bounds refuse; word order MATTERS (the
    property unigram perplexity lacks)."""
    import math

    import pytest

    from webalizer_spark.operators.quality import lm_perplexity_bigram

    rows = [(1, "a b a b"), (2, "b a b a"), (3, "a a b b")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in lm_perplexity_bigram(docs).collect()}

    toks = {i: t.split(" ") for i, t in rows}
    cnt = {}
    for t in toks.values():
        for w in t:
            cnt[w] = cnt.get(w, 0) + 1
    total, vocab, alpha, lam = sum(cnt.values()), len(cnt), 0.5, 0.8
    vw, v = {}, {}
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            vw[(a, b)] = vw.get((a, b), 0) + 1
            v[a] = v.get(a, 0) + 1

    def p_uni(w):
        return math.exp(math.log(
            (cnt[w] + alpha) / (total + alpha * (vocab + 1))))

    for did, t in toks.items():
        s = 0
        for i, w in enumerate(t):
            if i == 0:
                p = p_uni(w)
            else:
                pb = ((vw.get((t[i - 1], w), 0) + alpha)
                      / (v.get(t[i - 1], 0) + alpha * (vocab + 1)))
                p = lam * pb + (1 - lam) * p_uni(w)
            s += round(math.log(p), 6)
        nll = round(-s, 6)
        assert got[did]["ntok"] == len(t)
        assert got[did]["nll"] == pytest.approx(nll, abs=2e-6)
        assert got[did]["ppl"] == pytest.approx(
            round(math.exp(nll / len(t)), 6), abs=2e-6)

    # word salad: same unigram distribution, scrambled order -> higher
    # bigram perplexity than the naturally ordered corpus majority
    docs2 = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a b"), (3, "b b a a")],
        "doc_id bigint, text string")
    g2 = {r["doc_id"]: r["ppl"] for r in lm_perplexity_bigram(docs2).collect()}
    assert g2[3] > g2[1]

    with pytest.raises(ValueError, match="lam"):
        lm_perplexity_bigram(docs, lam=1.0)


def test_pii_stats_chain_order_and_counts(spark):
    """pii_stats counts what redact() replaces: an email's host is NOT
    re-counted by later rules (chain order), multiple spans per doc
    count individually, NULL text counts zero everywhere."""
    from webalizer_spark.operators.quality import pii_stats

    rows = [
        (1, "mail a@b.co and c@d.org plus ip 10.0.0.1"),
        (2, "card 4111 1111 1111 1111 then ssn 123-45-6789"),
        (3, None),
        (4, "clean text with number 20240201100000"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (got[1]["n_email"], got[1]["n_ip"]) == (2, 1)
    assert got[1]["n_pii"] == 3 and got[1]["has_pii"]
    assert (got[2]["n_card"], got[2]["n_ssn"]) == (1, 1)
    assert got[3]["n_pii"] == 0 and not got[3]["has_pii"]
    # compact timestamps must NOT look like cards (redact's own rule)
    assert got[4]["n_pii"] == 0


def test_corpus_diff_semantics(spark):
    """corpus_diff: added/removed/changed classification, unchanged
    docs silent, NULL text distinct from absent row, and only
    id+hash columns in the join (text pruned from the scan)."""
    from webalizer_spark.operators.quality import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (5, "e"), (4, "now set")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["change"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added", 4: "changed"}

    plan = corpus_diff(old, new)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # text is consumed by md5 below the join; the join itself carries
    # only (id, hash) — no raw text attribute survives into the join
    assert "FullOuter" in plan.replace(" ", "")


def test_html_to_text_rules(spark):
    """html_to_text per rule: script/style content gone, comments
    (incl. multi-line) gone, block closers become line breaks, inline
    tags strip in place, entities decode with &amp; LAST (no
    double-decode resurrecting markup), whitespace collapses per line,
    empty lines drop."""
    from webalizer_spark.operators.quality import html_to_text

    cases = [
        ("<p>hello   world</p><p>second</p>", "hello world\nsecond"),
        ("<script>var p = '<p>x</p>';</script><p>kept</p>", "kept"),
        ("<style>p{color:red}</style><p>kept</p>", "kept"),
        ("<!-- multi\nline comment --><p>kept</p>", "kept"),
        ("<p>a <b>bold</b> word</p>", "a bold word"),
        ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
        ("5 &lt; 6 &amp; 7 &gt; 2", "5 < 6 & 7 > 2"),
        # &amp;lt; is the LITERAL string '&lt;' — must not become '<'
        ("<p>&amp;lt;</p>", "&lt;"),
        ("<p></p><p> </p><p>only</p>", "only"),
        ("no markup at all", "no markup at all"),
        ("<SCRIPT>UPPER()</SCRIPT><P>case</P>", "case"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i int, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", html_to_text(F.col("html")).alias("t")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)


def test_dedup_lines_semantics(spark):
    """dedup_lines: first occurrence survives, later repeats drop,
    counts consistent with the rebuilt text (regression for the Spark
    lateral-column-alias pitfall where sizes silently recomputed over
    the REBUILT text when the output alias shadowed the input column),
    NULL text behaves as empty."""
    from webalizer_spark.operators.quality import dedup_lines

    rows = [(1, "a b\nc d\na b\ne f\nc d"),
            (2, "only one line"),
            (3, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert got[1]["text"] == "a b\nc d\ne f"
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (3, 2)
    assert got[2]["text"] == "only one line"
    assert (got[2]["n_kept"], got[2]["n_dropped"]) == (1, 0)
    assert got[3]["text"] == "" and got[3]["n_kept"] == 1


def test_char_entropy_known_values(spark):
    """char_entropy vs hand math: uniform 2-char doc = 1 bit, constant
    doc = 0, empty and NULL = 0, 4 equiprobable chars = 2 bits."""
    import pytest

    from webalizer_spark.operators.quality import char_entropy

    rows = [(1, "abab"), (2, "aaaa"), (3, ""), (4, None), (5, "abcd")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert got[1]["entropy_bits"] == pytest.approx(1.0)
    assert got[2]["entropy_bits"] == 0.0
    assert got[3]["entropy_bits"] == 0.0 and got[3]["n_chars_txt"] == 0
    assert got[4]["entropy_bits"] == 0.0
    assert got[5]["entropy_bits"] == pytest.approx(2.0)


def test_c4_whitespace_word_rule(spark):
    """Review regression: runs of spaces are ONE separator and tabs
    split — 'one  two  three.' is 3 words (drops at min_words=5), a
    tab-separated 5-worder keeps."""
    from webalizer_spark.operators.quality import c4_line_filter

    docs = spark.createDataFrame(
        [(1, "one  two  three.\na\tb\tc\td\te.\n"
             "regular five word line here.")],
        "doc_id bigint, text string")
    out = c4_line_filter(docs, min_words=5, min_lines=1).collect()
    assert out[0]["text"] == ("a\tb\tc\td\te.\n"
                              "regular five word line here.")
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (2, 1)


def test_keep_best_string_ids(spark):
    """Review regression: the keeper tie-break must not do arithmetic
    on the id — string ids work, highest score wins, tie -> min id."""
    from webalizer_spark.operators.dedup import drop_non_best_members

    docs = spark.createDataFrame(
        [("u-b", 5), ("u-a", 5), ("u-c", 9), ("solo", 1)],
        "doc_id string, score bigint")
    edges = spark.createDataFrame(
        [("u-b", "u-a"), ("u-a", "u-c")], "doc_a string, doc_b string")
    kept = sorted(r["doc_id"] for r in
                  drop_non_best_members(docs, edges, "score").collect())
    assert kept == ["solo", "u-c"]


def test_profile_table_wide_double_render(spark):
    """Review regression: epoch-millis-scale doubles (~1.7e12) must
    render, not overflow the decimal cast."""
    from webalizer_spark.operators.quality import profile_table

    df = spark.createDataFrame([(1, 1.7e12), (2, 2.5)],
                               "id bigint, v double")
    prof = {r["column_name"]: r for r in profile_table(df).collect()}
    assert prof["v"]["max_val"] == "1700000000000.000000"
    assert prof["v"]["min_val"] == "2.500000"


def test_prep_pipeline_composition_zero_exchange(spark):
    """The html_to_text -> dedup_lines -> c4_line_filter composition
    must stay ONE narrow projection chain — no Exchange anywhere (each
    stage is per-row HOFs, and composing them must not introduce a
    shuffle)."""
    from webalizer_spark.operators.quality import (
        c4_line_filter,
        dedup_lines,
        html_to_text,
    )

    docs = spark.createDataFrame(
        [(1, "<p>one two three four five.</p><p>one two three four "
             "five.</p><script>x</script><p>six seven eight nine ten!"
             "</p><p>more words in this line too?</p>")],
        "doc_id bigint, html string")
    ext = docs.select("doc_id", html_to_text(F.col("html")).alias("text"))
    out = c4_line_filter(dedup_lines(ext).select("doc_id", "text"),
                         min_words=5, min_lines=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    row = out.collect()[0]
    assert row["text"] == ("one two three four five.\n"
                           "six seven eight nine ten!\n"
                           "more words in this line too?")
    assert row["n_kept"] == 3


def test_split_sentences_rules(spark):
    """Sentence segmentation: terminal bursts ('?!', '...') stay with
    their sentence, unterminated fragments are sentences, whitespace
    trims, empty/NULL docs yield nothing, indices are per-doc."""
    from webalizer_spark.operators.quality import split_sentences

    rows = [(1, "One two. Three four?! Done... trailing frag"),
            (2, "no punctuation fragment only"),
            (3, ""), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {}
    for r in split_sentences(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"], r["n_words"]))
    assert sorted(got[1]) == [(0, "One two.", 2), (1, "Three four?!", 2),
                              (2, "Done...", 1), (3, "trailing frag", 2)]
    assert got[2] == [(0, "no punctuation fragment only", 4)]
    assert 3 not in got and 4 not in got


def test_chunk_by_sentences_semantics(spark):
    """Greedy sentence packing: whole sentences only, budget respected,
    oversized sentence becomes its own chunk, order preserved, empty
    and NULL docs yield nothing, max_tokens validates."""
    import pytest

    from webalizer_spark.operators.quality import chunk_by_sentences

    rows = [(1, "a b c. d e. f g h i j k l m n o p q r s t. u v."),
            (2, ""), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {}
    for r in chunk_by_sentences(docs, max_tokens=6).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"]))
    # 'a b c.'(3) + 'd e.'(2) fit in 6; the 16-word sentence is its own
    # oversized chunk; 'u v.' starts fresh
    assert sorted(got[1]) == [
        (0, "a b c. d e.", 5),
        (1, "f g h i j k l m n o p q r s t.", 15),
        (2, "u v.", 2)]
    assert 2 not in got and 3 not in got
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_by_sentences(docs, max_tokens=0)


def test_column_top_values_semantics(spark):
    """column_top_values: per-column count-desc value-asc ranking,
    NULL counts as a value (and sorts first among ties), k cuts,
    unknown/empty columns refuse."""
    import pytest

    from webalizer_spark.operators.quality import column_top_values

    rows = [("a", 1), ("a", 1), ("b", 1), (None, 2), (None, 2)]
    df = spark.createDataFrame(rows, "tag string, v bigint")
    got = [(r["column_name"], r["value"], r["cnt"], r["rnk"])
           for r in column_top_values(df, ["tag", "v"], k=2)
           .orderBy("column_name", "rnk").collect()]
    assert got == [
        ("tag", "a", 2, 1), ("tag", None, 2, 2),   # NULL ties, a < NULL?
        ("v", "1", 3, 1), ("v", "2", 2, 2),
    ] or got == [
        ("tag", None, 2, 1), ("tag", "a", 2, 2),
        ("v", "1", 3, 1), ("v", "2", 2, 2),
    ]
    # pin the actual NULL placement so the oracle and engine stay in
    # lockstep: Spark asc() is NULLS FIRST
    assert got[0] == ("tag", None, 2, 1)

    with pytest.raises(ValueError, match="unknown"):
        column_top_values(df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        column_top_values(df, [])
