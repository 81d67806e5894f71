from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.filters import (
    group_name,
    hide,
    ignore_include,
    wildcard_match,
)


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "v string")


def test_wildcard_grammar(spark):
    """Reference grammar [linklist.c ƒisinlist]: *foo suffix, foo* prefix,
    foo substring."""
    df = _vals(spark, ["search", "research", "searching", "python", "pyspark"])
    got = lambda pats: sorted(
        r["v"] for r in df.filter(wildcard_match(F.col("v"), pats)).collect())
    assert got(["*search"]) == ["research", "search"]
    assert got(["search*"]) == ["search", "searching"]
    assert got(["search"]) == ["research", "search", "searching"]
    assert got(["py*"]) == ["pyspark", "python"]
    assert got([]) == []


def test_ignore_include_override(spark):
    df = _vals(spark, ["a-keep", "a-drop", "b-other"])
    out = sorted(r["v"] for r in
                 ignore_include(df, "v", ignore=["a-*"], include=["*keep"]).collect())
    assert out == ["a-keep", "b-other"]


def test_hide_is_presentation_time(spark):
    """Hide suppresses display rows but must not change aggregates."""
    df = _vals(spark, ["x", "y", "z"]).groupBy("v").count()
    out = sorted(r["v"] for r in hide(df, "v", ["y"]).collect())
    assert out == ["x", "z"]


def test_group_name_first_match(spark):
    df = _vals(spark, ["python", "pyspark", "sql", "read"])
    groups = [("py*", "python-tools"), ("*l", "l-suffix"), ("read", "readers")]
    got = {r["v"]: r["g"] for r in
           df.withColumn("g", group_name(F.col("v"), groups)).collect()}
    assert got == {"python": "python-tools", "pyspark": "python-tools",
                   "sql": "l-suffix", "read": "readers"}
