"""Streaming twins: session_window sessionization + windowed tool counts
over the file source, cross-checked against the batch engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webalizer_spark.operators.parse import parse_transcripts
from webalizer_spark.operators.sessionize import sessionize
from webalizer_spark.streaming.session_stream import (
    streaming_session_counts,
    streaming_tool_counts,
)


def _run_stream(df, name: str):
    query = (df.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
    query.awaitTermination(120)
    return query


def test_streaming_sessions_match_batch(spark, transcripts, fixture_dir):
    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    q = _run_stream(streaming_session_counts(stream), "sess_stream")
    try:
        got = spark.sql(
            "select count(*) n, sum(hits) h from sess_stream").collect()[0]
        batch = sessionize(transcripts)
        n_sessions = batch.filter("is_new_session").count()
        # session_window merges on gap < timeout like the batch rule;
        # total sessions and covered rows must agree exactly
        assert got["n"] == n_sessions
        assert got["h"] == transcripts.count()
    finally:
        q.stop()


def test_streaming_tool_counts_match_batch(spark, transcripts, fixture_dir):
    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    q = _run_stream(streaming_tool_counts(stream), "tool_stream")
    try:
        got = {(r["hour_ts"], r["tool"]): r["hits"] for r in
               spark.sql("select * from tool_stream").collect()}
        parsed = parse_transcripts(transcripts)
        ref = {(r["hour_ts"], r["tool"]): r["hits"] for r in
               (parsed.filter("parse_ok and tool is not null")
                .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "tool")
                .agg(F.count(F.lit(1)).alias("hits"))).collect()}
        assert got == ref
    finally:
        q.stop()


def test_stateful_sessionize_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState twin: per-conv (last_ts, sessions) state
    carries across micro-batches AND query restarts — equal to one batch
    sessionize over the union."""
    import datetime as dt

    from webalizer_spark.streaming.session_stream import (
        streaming_sessionize_stateful,
    )

    t0 = dt.datetime(2024, 1, 5, 10, 0, 0)
    mk = lambda c, i, mins: (c, i, t0 + dt.timedelta(minutes=mins))  # noqa: E731
    # conv a: run1 ends 10:20, run2 resumes 10:40 (gap 20m < 30m -> SAME
    # session); conv b: resumes after 2h -> NEW session; conv c only in run2
    half1 = [mk("a", 0, 0), mk("a", 1, 20), mk("b", 0, 5)]
    half2 = [mk("a", 2, 40), mk("b", 1, 125), mk("c", 0, 130)]
    schema = "conv_id string, turn_idx int, ts timestamp"
    indir, outdir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(indir)
        stream = spark.readStream.schema(schema).parquet(indir)
        q = (streaming_sessionize_stateful(stream)
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    run(half1)
    run(half2)

    got = {(r["conv_id"], r["turn_idx"]): (r["is_new_session"], r["session_seq"])
           for r in spark.read.parquet(outdir).collect()}
    batch = sessionize(
        spark.createDataFrame(half1 + half2, schema), 1800)
    want = {(r["conv_id"], r["turn_idx"]): (r["is_new_session"], r["session_seq"])
            for r in batch.collect()}
    assert got == want
    # and the interesting rows behaved as designed
    assert got[("a", 2)] == (False, 1)   # resumed same session
    assert got[("b", 1)] == (True, 2)    # timeout -> new session
    assert got[("c", 0)] == (True, 1)    # unseen conv starts at 1


def test_streaming_multi_format_parse_matches_batch(spark, transcripts,
                                                    fixture_dir):
    """S2 under Structured Streaming: the multi-format parse is a
    stateless projection, so readStream -> parse -> aggregate equals the
    batch result exactly. In streaming the W3C field order must come
    from config (auto_w3c=False) — an unbounded stream cannot scan ahead
    for #Fields: directive rows, mirroring the reference's LogType
    config for continuous input."""
    from webalizer_spark.operators.parse import parse_transcripts_multi

    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    agg = (parse_transcripts_multi(stream, auto_w3c=False)
           .filter(F.col("parse_ok"))
           .groupBy("status").agg(F.count(F.lit(1)).alias("hits")))
    q = _run_stream(agg, "parse_stream")
    try:
        got = {r["status"]: r["hits"]
               for r in spark.sql("select * from parse_stream").collect()}
        batch = parse_transcripts_multi(transcripts, auto_w3c=False)
        want = {r["status"]: r["hits"]
                for r in batch.filter(F.col("parse_ok")).groupBy("status")
                .agg(F.count(F.lit(1)).alias("hits")).collect()}
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_streaming_error_routing_matches_batch(spark, transcripts,
                                               fixture_dir):
    """S4 under Structured Streaming: ok/bad routing is a stateless
    split, so streaming error counts (total + per-conv) equal batch
    exactly — the errors-sink twin for continuous ingestion."""
    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    bad = (parse_transcripts(stream).filter(~F.col("parse_ok"))
           .groupBy("conv_id").agg(F.count(F.lit(1)).alias("bad")))
    q = _run_stream(bad, "err_stream")
    try:
        got = {r["conv_id"]: r["bad"]
               for r in spark.sql("select * from err_stream").collect()}
        want = {r["conv_id"]: r["bad"] for r in
                parse_transcripts(transcripts).filter(~F.col("parse_ok"))
                .groupBy("conv_id").agg(F.count(F.lit(1)).alias("bad"))
                .collect()}
        assert got == want and sum(want.values()) > 0
    finally:
        q.stop()


def test_streaming_entry_exit_matches_batch(spark, transcripts, fixture_dir):
    """W2/W3 streaming twin: per-session (entry, exit, page_hits)
    multisets agree exactly with the batch sessionize -> entry_exit
    chain (sessions over ALL rows, pages selected inside the session)."""
    from webalizer_spark.operators.sessionize import entry_exit
    from webalizer_spark.streaming.session_stream import streaming_entry_exit

    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    q = _run_stream(streaming_entry_exit(stream), "ee_stream")
    try:
        got = sorted(
            (r["conv_id"], r["entry_page"], r["exit_page"], r["page_hits"])
            for r in spark.sql("select * from ee_stream").collect())
        batch = entry_exit(sessionize(transcripts))
        want = sorted(
            (r["conv_id"], r["entry_page"], r["exit_page"], r["page_hits"])
            for r in batch.collect())
        assert got == want
    finally:
        q.stop()


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming first-arrival dedup == batch min-id dedup when the
    stream replays in id order (one file per micro-batch), and the
    watermarked variant drops an in-horizon re-crawl."""
    import pandas as pd

    from webalizer_spark.operators.dedup import exact_dedup
    from webalizer_spark.streaming.session_stream import (
        streaming_exact_dedup,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    # append exact duplicates of the first 40 docs under new ids
    dups = (docs.filter("doc_id < 40")
            .withColumn("doc_id", F.col("doc_id") + 100000))
    full = docs.unionByName(dups)
    batch_kept = {r["doc_id"] for r in
                  exact_dedup(full).select("doc_id").collect()}

    # replay in doc_id order, one file per trigger
    src = tmp_path / "stream_src"
    for lo, hi, fn in [(0, 250, "a"), (250, 100000, "b"),
                       (100000, 200000, "c")]:
        (full.filter(f"doc_id >= {lo} and doc_id < {hi}")
         .orderBy("doc_id").coalesce(1)
         .write.parquet(str(src / fn)))
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (streaming_exact_dedup(stream).writeStream.format("memory")
         .queryName("dedup_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        got = {r["doc_id"] for r in
               spark.sql("select doc_id from dedup_stream").collect()}
    finally:
        q.stop()
    assert got == batch_kept

    # watermarked variant: duplicate arriving within the horizon drops
    wm_src = tmp_path / "wm_src"
    pd1 = pd.DataFrame({"doc_id": [1, 2], "text": ["aa", "bb"],
                        "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                              "2024-01-01 00:10:00"])})
    pd2 = pd.DataFrame({"doc_id": [3], "text": ["aa"],
                        "ts": pd.to_datetime(["2024-01-01 00:20:00"])})
    sdf = spark.createDataFrame(pd1)
    spark.createDataFrame(pd1).coalesce(1).write.parquet(str(wm_src / "a"))
    spark.createDataFrame(pd2).coalesce(1).write.parquet(str(wm_src / "b"))
    stream2 = (spark.readStream.schema(sdf.schema)
               .option("maxFilesPerTrigger", 1)
               .option("recursiveFileLookup", "true")
               .parquet(str(wm_src)))
    q2 = (streaming_exact_dedup(stream2, ts_col="ts", watermark="1 hour")
          .writeStream.format("memory").queryName("dedup_wm")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    try:
        kept = {r["doc_id"] for r in
                spark.sql("select doc_id from dedup_wm").collect()}
    finally:
        q2.stop()
    assert kept == {1, 2}


def test_streaming_rolling_zscore_matches_batch(spark, tmp_path):
    """Analytics-family twin: streaming_rolling_zscore over the daily
    count stream — replayed in two restarts with state carried across
    the boundary — equals the batch rolling_zscore that backs
    evt_anomalies, bit-for-bit including the 6dp HALF_UP round."""
    from webalizer_spark.operators.aggregates import rolling_zscore
    from webalizer_spark.streaming.session_stream import (
        streaming_rolling_zscore,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    daily = (ev.groupBy("event_type",
                        F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("day_num", F.datediff("day", F.lit("1970-01-01"))))

    want = {(r["event_type"], str(r["day"])): (r["n"], r["z"], r["is_anomaly"])
            for r in rolling_zscore(daily, "n", "day_num", "event_type")
            .collect()}

    indir, outdir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    schema = "event_type string, day date, n long"
    half = F.col("day") < F.lit("2024-01-16")

    def run(df):
        df.select("event_type", "day", "n").coalesce(1) \
            .write.mode("append").parquet(indir)
        stream = spark.readStream.schema(schema).parquet(indir)
        q = (streaming_rolling_zscore(stream)
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    run(daily.filter(half))          # days 1-15
    run(daily.filter(~half))         # days 16-30: state crosses restart

    got = {(r["event_type"], str(r["day"])): (r["n"], r["z"], r["is_anomaly"])
           for r in spark.read.parquet(outdir).collect()}
    assert got == want
    assert len(got) == daily.count()


def test_streaming_top_paths_match_batch(spark, transcripts, fixture_dir):
    """The streaming top-N report equals the batch top_n over the same
    fixture — same metric, same deterministic tie-break, same N-cut."""
    from webalizer_spark.operators.topn import top_n
    from webalizer_spark.streaming.session_stream import streaming_top_paths

    schema = transcripts.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "transcripts.parquet")
              .parquet(fixture_dir))
    q = _run_stream(streaming_top_paths(stream, n=10), "toppath_stream")
    try:
        got = [(r["path"], r["hits"], r["bytes_total"]) for r in
               spark.sql("select * from toppath_stream"
                         " order by hits desc, path asc").collect()]
        parsed = parse_transcripts(transcripts)
        batch_agg = (parsed.filter(F.col("parse_ok")
                                   & F.col("path").isNotNull())
                     .groupBy("path")
                     .agg(F.count(F.lit(1)).alias("hits"),
                          F.sum(F.col("nbytes")).alias("bytes_total")))
        ref = [(r["path"], r["hits"], r["bytes_total"]) for r in
               top_n(batch_agg, "hits", "path", 10).collect()]
        assert got == ref and len(got) == 10
    finally:
        q.stop()
