from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.quality import (
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
