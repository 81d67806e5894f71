from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.topn import full_dump, top_n, with_rank, with_share


def _df(spark):
    rows = [("a", 10), ("b", 30), ("c", 30), ("d", 5)]
    return spark.createDataFrame(rows, "k string, m long")


def test_top_n_deterministic_ties(spark):
    got = [r["k"] for r in top_n(_df(spark), "m", "k", 3).collect()]
    assert got == ["b", "c", "a"]          # metric desc, key asc on ties


def test_with_rank(spark):
    got = {r["k"]: r["rank"] for r in with_rank(_df(spark), "m", "k", 4).collect()}
    assert got == {"b": 1, "c": 2, "a": 3, "d": 4}


def test_with_share(spark):
    got = {r["k"]: r["pct"] for r in with_share(_df(spark), "m").collect()}
    assert got["b"] == 40.0 and got["d"] == round(5 * 100 / 75, 4)


def test_full_dump_sorted(spark):
    got = [r["k"] for r in full_dump(_df(spark), "m", "k").collect()]
    assert got == ["b", "c", "a", "d"]


def test_with_rank_null_key_no_duplicate_ranks(spark):
    """A NULL key must not produce duplicate ranks on metric ties: the
    tiebreak is null-safe, NULL key first (matching asc() NULLS FIRST in
    top_n's orderBy) — round-4 advice."""
    df = spark.createDataFrame(
        [("a", 10), (None, 10), ("b", 20)], "k string, m int")
    got = {r["k"]: r["rank"] for r in with_rank(df, "m", "k", 10).collect()}
    assert got == {"b": 1, None: 2, "a": 3}
    assert sorted(got.values()) == [1, 2, 3]


def test_with_rank_null_metric_ranks_last(spark):
    """NULL metrics rank LAST (matching desc_nulls_last ordering), never
    as duplicate rank-1 rows."""
    from webalizer_spark.operators.topn import with_rank

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 3), ("d", None)], "k string, m int")
    got = {r["k"]: r["rank"] for r in with_rank(df, "m", "k", 10).collect()}
    assert got == {"a": 1, "c": 2, "b": 3, "d": 4}
