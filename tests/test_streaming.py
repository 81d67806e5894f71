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
