"""Multi-format record decode (SURVEY §2.1 S2).

The reference dispatches on LogType to four parsers [parser.c
ƒparse_record ~40 dispatching to ƒparse_record_web (CLF/combined),
ƒparse_record_ftp (xferlog), ƒparse_record_squid (native), and
ƒparse_record_w3c (#Fields-driven)]. The engine's recast: per-format
regexes normalized into the SAME canonical raw-field struct, with
format either declared (config, like the reference's LogType) or
detected per row by cheap shape tests — a `when()` ladder, zero Python.

Canonical fields: actor ident auth_user dt_text verb path status_text
bytes_text referrer agent_str (GROK_FIELDS). Formats that lack a field
yield NULL there, like the reference fills log_struct with blanks.

Format grammars (transcript-domain analogs of the reference's):
  combined   the FIXTURES.md grammar (functions/grok.py MASTER_PATTERN)
  squid      epoch.ms elapsed actor code/status bytes verb path user
             (native squid access.log shape [parser.c ƒparse_record_squid])
  xferlog    DDD Mon dd HH:MM:SS yyyy elapsed actor bytes path ... user
             (FTP xferlog shape [parser.c ƒparse_record_ftp])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webalizer_spark.functions.grok import GROK_FIELDS, MASTER_PATTERN, _US

SQUID_PATTERN = (
    r"^(\d+)\.(\d{3})\s+(\d+) (\S+) (\S+)/(\d{3}) (\d+) (\S+) (\S+) (\S+).*$"
)
# groups: 1 epoch 2 ms 3 elapsed 4 actor 5 result 6 status 7 bytes
#         8 verb 9 path 10 user

XFERLOG_PATTERN = (
    r"^\w{3} (\w{3}) ([ \d]\d) (\d{2}:\d{2}:\d{2}) (\d{4}) (\d+) (\S+) "
    r"(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+).*$"
)
# groups: 1 Mon 2 dd 3 time 4 yyyy 5 elapsed 6 actor 7 bytes 8 path
#         9 xfertype 10 action 11 direction 12 mode 13 user ...


def detect_format(text: Column) -> Column:
    """Cheap per-row shape detection (LogType auto mode).

    combined lines start with a token then ' - '-ish fields and contain
    '['; squid lines start with an epoch.millis number; xferlog lines
    start with a weekday name. One rlike each on a short prefix.
    """
    head = F.substring(text, 1, 24)
    return (
        F.when(head.rlike(r"^\d{9,10}\.\d{3}\s"), F.lit("squid"))
        .when(head.rlike(r"^(Mon|Tue|Wed|Thu|Fri|Sat|Sun) "), F.lit("xferlog"))
        .otherwise(F.lit("combined"))
    )


def _pack(text: Column, pattern: str, mapping: list[int | None]) -> Column:
    """regexp_replace-pack the chosen groups (in GROK_FIELDS order) into a
    US-delimited record; None -> empty (NULL after split)."""
    repl = _US + _US.join("" if g is None else f"${g}" for g in mapping)
    return F.regexp_replace(F.replace(text, F.lit(_US), F.lit("")),
                            pattern, repl)


# mapping: canonical field -> regex group per format
_COMBINED_MAP = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
_SQUID_MAP = [4, None, 10, 1, 8, 9, 6, 7, None, None]   # dt_text = epoch
_XFERLOG_MAP = [6, None, 13, None, None, 8, None, 7, None, 9]


def apply_grok_multi(df: DataFrame, text_col: str = "text",
                     format_col: str | None = None) -> DataFrame:
    """Format-dispatched grok: adds `log_format` + the canonical
    GROK_FIELDS raw columns. Each format's regex runs only on its rows
    (the when() ladder short-circuits), all JVM-side.

    For squid rows dt_text carries the epoch seconds (cast downstream via
    to_timestamp(from_unixtime(...))); for xferlog rows the datetime
    pieces would be reassembled downstream — the reference does the same
    re-parse [parser.c per-format datetime handling].
    """
    fmt = F.col(format_col) if format_col else detect_format(F.col(text_col))
    tagged = df.withColumn("log_format", fmt)
    packed = (
        F.when(F.col("log_format") == "squid",
               _pack(F.col(text_col), SQUID_PATTERN, _SQUID_MAP))
        .when(F.col("log_format") == "xferlog",
              _pack(F.col(text_col), XFERLOG_PATTERN, _XFERLOG_MAP))
        .otherwise(_pack(F.col(text_col), MASTER_PATTERN, _COMBINED_MAP))
    )
    with_parts = tagged.withColumn("_parts", F.split(packed, _US, -1))
    return with_parts.select(
        *tagged.columns,
        *[F.nullif(F.get(F.col("_parts"), i + 1), F.lit("")).alias(n)
          for i, n in enumerate(GROK_FIELDS)],
    )
