"""Parse stage: grok the ``text`` column into typed fields (SURVEY §2.1 S2-S4).

Mirrors the reference record loop's parse step [parser.c ƒparse_record ->
ƒparse_record_web; webalizer.c datetime convert + total_bad tally], as one
declarative projection chain:

  text --grok--> raw string fields --cast/validate--> typed columns + parse_ok

parse_ok is the bad-record predicate: a row is OK iff the line matched the
grammar AND its datetime parses AND status/bytes are integral. bytes '-'
-> 0 (the reference treats '-' transfer as zero). Everything is a built-in
expression — one regex pass (grok 'split' default), then cheap casts —
all inside whole-stage codegen; no shuffle, no Python in the default path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webalizer_spark.config import DEFAULT_CONFIG, EngineConfig
from webalizer_spark.datagen import SPARK_TS_FMT
from webalizer_spark.functions.grok import apply_grok
from webalizer_spark.functions.scalars import sanitize

BASE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def parse_transcripts(
    df: DataFrame,
    strategy: str = "split",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> parsed.

    Output adds: actor, ident, auth_user, verb, path, status int,
    nbytes long, referrer, agent_str, ts_text timestamp, parse_ok bool.
    """
    clean = df.withColumn("text", sanitize(F.col("text"), cfg.max_field_len))
    raw = apply_grok(clean, "text", strategy)
    out = raw.select(
        *BASE_COLS,
        "actor",
        F.nullif(F.col("ident"), F.lit("-")).alias("ident"),
        F.nullif(F.col("auth_user"), F.lit("-")).alias("auth_user"),
        "verb",
        "path",
        F.try_to_timestamp(F.col("dt_text"), F.lit(SPARK_TS_FMT)).alias("ts_text"),
        F.col("status_text").try_cast("int").alias("status"),
        F.coalesce(
            F.col("bytes_text").try_cast("long"),
            F.when(F.col("bytes_text") == "-", F.lit(0)),
        ).alias("nbytes"),
        F.nullif(F.col("referrer"), F.lit("-")).alias("referrer"),
        "agent_str",
    )
    parse_ok = (
        F.col("actor").isNotNull()
        & F.col("verb").isNotNull()
        & F.col("path").isNotNull()
        & F.col("ts_text").isNotNull()
        & F.col("status").isNotNull()
        & F.col("nbytes").isNotNull()
    )
    return out.withColumn("parse_ok", parse_ok)


def split_ok_bad(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Bad-record routing (S4): ok rows continue; bad rows -> errors sink
    with the raw line preserved (the reference's Debug dump analog)."""
    ok = parsed.filter(F.col("parse_ok"))
    bad = parsed.filter(~F.col("parse_ok")).select(*BASE_COLS)
    return ok, bad
