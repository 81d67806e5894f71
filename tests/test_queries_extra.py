from __future__ import annotations

from webalizer_spark.queries import UNGRADED, UNGRADED_ORACLE

SF = "/root/testdata/sf0.01"


def test_ungraded_split_and_redact_match_duckdb(spark):
    """The round-5 ungraded oracle rows (hash_split buckets, PII
    redaction) match their DuckDB twins bit-exact — same check the
    driver runs for graded rows, executed here because the graded
    window is capped at 50."""
    import os
    import sys

    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from verify_queries import canon

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM '{SF}/events.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{SF}/embeddings.parquet'")
    for name in ("doc_hash_split", "doc_redact",
                 "doc_repetition", "doc_decontam",
                 "doc_span_dedup", "doc_lm_ppl", "doc_length_stats",
                 "tr2_json", "tr2_alb", "emb_semdedup_keep", "doc_mixing",
                 "doc_mixture_rows", "doc_tfidf_top", "evt_pagerank",
                 "doc_chunks", "doc_blocklist", "doc_normalize"):
        sdf = UNGRADED[name](spark, SF).toPandas()
        odf = con.sql(UNGRADED_ORACLE[name]).df()
        sc, sr = canon(sdf)
        oc, orows = canon(odf)
        assert sc == oc, (name, sc, oc)
        assert sr == orows, (name, len(sr), len(orows))


def test_approx_distinct_tolerance(spark):
    """A8 scale tier: HLL++ approx distinct within its documented rsd of
    exact (default 5% rsd — allow 15% absolute here)."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {r["day_ts"]: r["sites"] for r in
             ev.groupBy(F.date_trunc("day", "ts").alias("day_ts"))
               .agg(F.countDistinct("user_id").alias("sites")).collect()}
    approx = {r["day_ts"]: r["approx_sites"] for r in
              UNGRADED["evt_approx_distinct"](spark, SF).collect()}
    assert set(exact) == set(approx)
    for d, e in exact.items():
        assert abs(approx[d] - e) <= max(2, 0.15 * e), (d, e, approx[d])
