"""Enrichment stage — the reference's lookup joins recast as broadcast joins
(SURVEY §2.3 J1-J4).

The reference enriches each record via (a) a DNS-cache hostname lookup
[dns_resolv.c ƒresolve_dns], (b) a TLD->country table scan
[webalizer.c ctry[] accumulation], (c) a GeoDB numeric-range lookup
[dns_resolv.c GeoDB], and (d) a SearchEngine-list referrer match
[webalizer.c ƒsrch_string]. All are fact x tiny-dimension lookups, so every
one becomes an explicitly-broadcast left join: zero shuffle of the fact
table, dimension replicated to every executor — the correct shape at
100 TB (the dims are <1 MB; a shuffle join here would be a catastrophe).

Unknown keys keep the reference's "Unresolved/Unknown" bucket semantics:
left join + coalesce to 'unknown'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webalizer_spark.functions.scalars import search_terms


def enrich_role_class(df: DataFrame, role_class: DataFrame,
                      role_col: str = "role") -> DataFrame:
    """J1 analog: role -> actor_class broadcast map (DNS-cache recast)."""
    dim = F.broadcast(role_class.select(
        F.col("role").alias("_rc_role"), "actor_class"))
    return (
        df.join(dim, df[role_col] == dim["_rc_role"], "left")
        .drop("_rc_role")
        .withColumn("actor_class", F.coalesce("actor_class", F.lit("unknown")))
    )


def enrich_tool_family(df: DataFrame, tool_family: DataFrame,
                       tool_col: str = "tool") -> DataFrame:
    """J2 analog: tool -> tool_family broadcast map (TLD->country recast).

    NULL tool (non-tool turn) maps to NULL family; unknown tool -> 'unknown'.
    """
    dim = F.broadcast(tool_family.select(
        F.col("tool").alias("_tf_tool"), "tool_family"))
    out = df.join(dim, df[tool_col] == dim["_tf_tool"], "left").drop("_tf_tool")
    return out.withColumn(
        "tool_family",
        F.when(F.col(tool_col).isNull(), F.lit(None))
        .otherwise(F.coalesce("tool_family", F.lit("unknown"))),
    )


def enrich_size_class(df: DataFrame, byte_ranges: DataFrame,
                      bytes_col: str = "nbytes") -> DataFrame:
    """J3 analog: numeric range lookup (GeoDB ip-in-[lo,hi] recast).

    Broadcast + BETWEEN condition -> BroadcastNestedLoopJoin. With a ~6-row
    dim that is O(rows x 6) comparisons, cheaper than any shuffle; ranges
    are non-overlapping so the join is 1:at-most-1.
    """
    dim = F.broadcast(byte_ranges.select("lo", "hi", "size_class"))
    cond = (F.col(bytes_col) >= F.col("lo")) & (F.col(bytes_col) <= F.col("hi"))
    return df.join(dim, cond, "left").drop("lo", "hi").withColumn(
        "size_class", F.coalesce("size_class", F.lit("unknown")))


def enrich_search_terms(df: DataFrame, engine_params: DataFrame,
                        referrer_col: str = "referrer") -> DataFrame:
    """J4 analog: SearchEngine list match + query-param term extraction
    [webalizer.c ƒsrch_string]. Adds `engine_host` and `search_term`
    (NULL when the referrer is absent or not a known engine).
    """
    host = F.parse_url(F.col(referrer_col), F.lit("HOST"))
    dim = F.broadcast(engine_params.select(
        F.col("engine_host").alias("_ep_host"), "query_param"))
    out = (
        df.withColumn("_ref_host", host)
        .join(dim, F.col("_ref_host") == F.col("_ep_host"), "left")
        .drop("_ep_host")
    )
    term = F.when(
        F.col("query_param").isNotNull(),
        search_terms(F.col(referrer_col), F.col("query_param")),
    )
    return (
        out.withColumn("engine_host", F.col("_ref_host"))
        .withColumn("search_term", term)
        .drop("_ref_host", "query_param")
    )


def enrich_all(df: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """Full enrichment: role_class, tool_family, size_class, search terms."""
    out = enrich_role_class(df, dims["role_class"])
    out = enrich_tool_family(out, dims["tool_family"])
    out = enrich_size_class(out, dims["byte_ranges"])
    out = enrich_search_terms(out, dims["engine_params"])
    return out
