from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.filters import (
    group_name,
    hide,
    ignore_include,
    page_predicate,
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


def test_page_predicate_extension_semantics(spark):
    """Reference ispage() [webalizer.c]: PageType patterns match the
    EXTENSION after the last dot (not the whole path); extension-less
    paths (incl. a leading-dot-only name) and trailing-slash paths are
    always pages (round-4 advice)."""
    rows = [
        ("a/x.html", True),     # 'htm*' matches extension 'html'
        ("a/x.gif", False),     # extension not in list
        ("a.b/y.cgi", True),    # last dot wins -> 'cgi'
        ("dir/sub/", True),     # trailing slash = page
        ("noext", True),        # no dot = page
        (".bashrc", True),      # only dot at index 0 = no extension
        ("a.gif/", True),       # trailing slash beats extension
        ("deep/a.htm", True),
    ]
    df = spark.createDataFrame([(p,) for p, _ in rows], "path string") \
        .withColumn("tool", F.lit(None).cast("string"))
    pred = page_predicate(("htm*", "cgi"))
    got = {r["path"]: r["p"] for r in df.withColumn("p", pred).collect()}
    assert got == {p: e for p, e in rows}
    # without patterns the recast default applies: tool IS NOT NULL
    d2 = spark.createDataFrame([("x.gif", "bash"), ("y.html", None)],
                               "path string, tool string")
    got2 = {r["path"]: r["p"] for r in
            d2.withColumn("p", page_predicate(())).collect()}
    assert got2 == {"x.gif": True, "y.html": False}


def test_group_name_first_match(spark):
    df = _vals(spark, ["python", "pyspark", "sql", "read"])
    groups = [("py*", "python-tools"), ("*l", "l-suffix"), ("read", "readers")]
    got = {r["v"]: r["g"] for r in
           df.withColumn("g", group_name(F.col("v"), groups)).collect()}
    assert got == {"python": "python-tools", "pyspark": "python-tools",
                   "sql": "l-suffix", "read": "readers"}
