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


def test_enrich_ip_class_longest_prefix(spark):
    """CIDR classification: longest prefix wins over covering blocks,
    /32 host routes beat everything, malformed/unmatched IPs take the
    default, ip_aton validates octets, bad CIDR specs refuse, and the
    plan is join-free (literal block array, per-row HOFs only)."""
    import pytest
    from pyspark.sql import functions as F

    from webalizer_spark.operators.enrich import enrich_ip_class, ip_aton

    df = spark.createDataFrame(
        [(1, "10.1.2.3"),        # /8 only
         (2, "10.64.0.9"),       # /8 + /10 -> /10 wins
         (3, "10.64.77.1"),      # /8 + /10 + /24 -> /24 wins
         (4, "10.64.77.200"),    # /32 host route beats the /24
         (5, "192.168.1.1"),     # unmatched
         (6, "999.1.2.3"),       # malformed octet
         (7, "not an ip"),
         (8, None)],
        "doc_id long, actor string")
    blocks = [("10.0.0.0/8", "corp"), ("10.64.0.0/10", "lab"),
              ("10.64.77.0/24", "rack"), ("10.64.77.200/32", "host")]
    got = {r["doc_id"]: r["ip_class"]
           for r in enrich_ip_class(df, blocks).collect()}
    assert got == {1: "corp", 2: "lab", 3: "rack", 4: "host",
                   5: "unknown", 6: "unknown", 7: "unknown", 8: "unknown"}

    aton = {r["doc_id"]: r["v"] for r in
            df.select("doc_id", ip_aton(F.col("actor")).alias("v"))
            .collect()}
    assert aton[1] == 10 * 16777216 + 1 * 65536 + 2 * 256 + 3
    assert aton[6] is None and aton[7] is None and aton[8] is None

    with pytest.raises(ValueError, match="prefix length"):
        enrich_ip_class(df, [("10.0.0.0/40", "x")])
    with pytest.raises(ValueError, match="address"):
        enrich_ip_class(df, [("10.0.0/8", "x")])

    plan = enrich_ip_class(df, blocks)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_enrich_ip_class_edge_configs(spark):
    """Empty block list classifies everything as the default (no VOID
    crash); malformed CIDR strings refuse with the spec named; the
    parsed ip materializes once per row (the plan contains ONE split
    of the ip column, not one per block comparison)."""
    import pytest

    from webalizer_spark.operators.enrich import enrich_ip_class

    df = spark.createDataFrame([(1, "10.1.2.3")], "doc_id long, actor string")
    assert enrich_ip_class(df, []).collect()[0]["ip_class"] == "unknown"
    with pytest.raises(ValueError, match="prefix length in '10.0.0.0/abc'"):
        enrich_ip_class(df, [("10.0.0.0/abc", "x")])
    with pytest.raises(ValueError, match="address in '10.a.0.0/8'"):
        enrich_ip_class(df, [("10.a.0.0/8", "x")])

    # the parsed ip materializes once: the split() count in the plan
    # must NOT scale with the block count (pre-fix it was per-block,
    # per-comparison inside the interpreted HOF lambda)
    def nsplit(n):
        blocks = [(f"10.{i}.0.0/16", f"c{i}") for i in range(n)]
        plan = enrich_ip_class(df, blocks)._jdf.queryExecution() \
            .executedPlan().toString()
        return plan.count("split(actor")

    assert nsplit(2) == nsplit(16)


def test_parse_robots_grouping_and_rules(spark):
    """REP spec parse: stacked User-agent lines share following rules,
    a User-agent after a rule starts a NEW group, rules before any
    User-agent drop, comments strip, empty Disallow drops, agents
    fold to lowercase."""
    from webalizer_spark.operators.enrich import parse_robots

    txt = "\n".join([
        "Disallow: /orphan",                  # before any UA: ignored
        "User-agent: GoogleBot",              # stacked with next line
        "User-Agent: mybot",
        "Disallow: /private   # comment",
        "Allow: /private/ok",
        "Disallow:",                          # empty -> no rule
        "User-agent: *",                      # NEW group (after rules)
        "Disallow: /tmp",
        "# full comment line",
    ])
    robots = spark.createDataFrame([("h1", txt)], "host string, text string")
    got = {(r["agent"], r["allow"], r["prefix"])
           for r in parse_robots(robots).collect()}
    assert got == {
        ("googlebot", False, "/private"), ("googlebot", True, "/private/ok"),
        ("mybot", False, "/private"), ("mybot", True, "/private/ok"),
        ("*", False, "/tmp"),
    }

    # a group whose ONLY directive is an empty Disallow still EXISTS:
    # it emits a marker row (allow/prefix NULL) so robots_filter sees
    # the specific group and does NOT fall back to '*'
    robots2 = spark.createDataFrame(
        [("h2", "User-agent: mybot\nDisallow:\nUser-agent: *\n"
                "Disallow: /")],
        "host string, text string")
    rows2 = parse_robots(robots2).collect()
    marker = [r for r in rows2 if r["agent"] == "mybot"]
    assert len(marker) == 1 and marker[0]["prefix"] is None


def test_robots_filter_precedence(spark):
    """Longest prefix wins; Allow beats Disallow on equal length;
    specific-agent group REPLACES '*' when present; no rules or no
    match -> allowed; URLs on rule-less hosts survive."""
    from webalizer_spark.operators.enrich import parse_robots, robots_filter

    robots = spark.createDataFrame([
        ("h1", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
               "User-agent: mybot\nDisallow: /only-mybot"),
        ("h2", "User-agent: *\nDisallow: /\nAllow: /"),   # tie: allow wins
    ], "host string, text string")
    rules = parse_robots(robots)
    urls = spark.createDataFrame([
        (1, "h1", "/private/x"),      # * group: disallow
        (2, "h1", "/private/ok/y"),   # * group: longer allow wins
        (3, "h1", "/public"),         # no match -> allowed
        (4, "h2", "/anything"),       # equal-length tie -> allow
        (5, "h3", "/no-robots"),      # host without rules -> allowed
        (6, "h1", "/only-mybot"),     # * group ignores mybot's rule
    ], "url_id bigint, host string, path string")
    star = {r["url_id"]: r["allowed"]
            for r in robots_filter(urls, rules, "*").collect()}
    assert star == {1: False, 2: True, 3: True, 4: True, 5: True, 6: True}
    # mybot on h1: its own group replaces '*' entirely
    mine = {r["url_id"]: r["allowed"]
            for r in robots_filter(urls, rules, "MyBot").collect()}
    assert mine[6] is False and mine[1] is True  # /private not in mybot grp
    assert mine[4] is True                       # h2 has no mybot -> '*'

    # empty-Disallow specific group REPLACES '*': everything allowed
    # for mybot even though '*' disallows the whole site (REP bug the
    # round-6 review caught: the group used to vanish entirely)
    robots3 = spark.createDataFrame(
        [("h9", "User-agent: mybot\nDisallow:\nUser-agent: *\n"
                "Disallow: /")],
        "host string, text string")
    urls3 = spark.createDataFrame([(1, "h9", "/anything")],
                                  "url_id bigint, host string, path string")
    r3 = parse_robots(robots3)
    assert robots_filter(urls3, r3, "mybot").collect()[0]["allowed"] is True
    assert robots_filter(urls3, r3, "other").collect()[0]["allowed"] is False
