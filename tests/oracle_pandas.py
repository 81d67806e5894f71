"""Pure-pandas mini-oracle for the transcript pipeline (SURVEY §5.2 item 2).

Independently re-derives, from the raw fixture parquet, everything the
engine computes: parse ok/bad split, typed fields, enrichment classes,
30-min sessionization, daily totals, status histogram, per-tool table,
entry/exit counts. Deliberately row-at-a-time-ish pandas (regex extract +
groupbys) — a different execution model than the Spark plans it checks.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

MASTER = re.compile(
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] '
    r'"(\S+) /(\S+) [^"]*" '
    r'(\d{3}) (\S+) "([^"]*)" "([^"]*)"$'
)

FIELDS = ["actor", "ident", "auth_user", "dt_text", "verb",
          "path", "status_text", "bytes_text", "referrer", "agent_str"]

ROLE_CLASS = {"user": "human", "assistant": "model", "system": "control",
              "tool": "machine", "agent": "machine"}


def parse(pdf: pd.DataFrame) -> pd.DataFrame:
    ext = pdf["text"].str.extract(MASTER)
    ext.columns = FIELDS
    out = pd.concat([pdf.reset_index(drop=True), ext.reset_index(drop=True)], axis=1)
    dt = pd.to_datetime(out["dt_text"], format="%d/%b/%Y:%H:%M:%S %z",
                        errors="coerce")
    out["ts_text"] = dt.dt.tz_convert("UTC").dt.tz_localize(None)
    out["status"] = pd.to_numeric(out["status_text"], errors="coerce")
    nbytes = pd.to_numeric(out["bytes_text"], errors="coerce")
    nbytes = nbytes.where(out["bytes_text"] != "-", 0)
    out["nbytes"] = nbytes
    out["parse_ok"] = (out["actor"].notna() & out["verb"].notna()
                       & out["path"].notna() & out["ts_text"].notna()
                       & out["status"].notna() & out["nbytes"].notna())
    out["referrer"] = out["referrer"].replace("-", np.nan)
    out["ident"] = out["ident"].replace("-", np.nan)
    return out


def sessionize(ok: pd.DataFrame, timeout_s: int = 1800) -> pd.DataFrame:
    s = ok.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    es = pd.Series(s["ts"].to_numpy().astype("datetime64[s]").astype("int64"),
                   index=s.index)
    newconv = s["conv_id"].ne(s["conv_id"].shift())
    gap = es - es.shift()
    s["is_new_session"] = (newconv | (gap >= timeout_s))
    s["session_seq"] = (s["is_new_session"].astype("int64")
                        .groupby(s["conv_id"]).cumsum())
    return s


def daily_totals(ok: pd.DataFrame) -> pd.DataFrame:
    s = ok.copy()
    s["day_ts"] = s["ts"].dt.floor("D")
    g = s.groupby("day_ts")
    out = pd.DataFrame({
        "hits": g.size(),
        "files": g.apply(lambda x: int((x["status"] == 200).sum()), include_groups=False),
        "pages": g.apply(lambda x: int(x["tool"].notna().sum()), include_groups=False),
        "errors": g.apply(lambda x: int((x["status"] >= 400).sum()), include_groups=False),
        "kbytes": g.apply(lambda x: float(x["nbytes"].sum()) / 1024.0, include_groups=False),
        "sites": g.apply(lambda x: x["conv_id"].nunique(), include_groups=False),
        "visits": g.apply(lambda x: int(x["is_new_session"].sum()), include_groups=False),
    }).reset_index()
    return out


def status_histogram(ok: pd.DataFrame) -> pd.DataFrame:
    return (ok.groupby("status").size().rename("hits").reset_index()
            .astype({"status": "int64", "hits": "int64"}))


def per_tool(ok: pd.DataFrame) -> pd.DataFrame:
    t = ok[ok["tool"].notna()]
    g = t.groupby("tool")
    return pd.DataFrame({
        "hits": g.size(),
        "files": g.apply(lambda x: int((x["status"] == 200).sum()), include_groups=False),
        "kbytes": g.apply(lambda x: float(x["nbytes"].sum()) / 1024.0, include_groups=False),
    }).reset_index()


def entry_exit_counts(sessions: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    pages = sessions[sessions["tool"].notna()].sort_values(
        ["conv_id", "session_seq", "ts", "turn_idx"])
    first = pages.groupby(["conv_id", "session_seq"]).first()
    last = pages.groupby(["conv_id", "session_seq"]).last()
    entries = first.groupby("tool").size().rename("entries").reset_index() \
                   .rename(columns={"tool": "page"})
    exits = last.groupby("tool").size().rename("exits").reset_index() \
                .rename(columns={"tool": "page"})
    return entries, exits


def actor_class_totals(ok: pd.DataFrame) -> pd.DataFrame:
    s = ok.copy()
    s["actor_class"] = s["role"].map(ROLE_CLASS).fillna("unknown")
    g = s.groupby("actor_class")
    return pd.DataFrame({
        "hits": g.size(),
        "files": g.apply(lambda x: int((x["status"] == 200).sum()), include_groups=False),
        "kbytes": g.apply(lambda x: float(x["nbytes"].sum()) / 1024.0, include_groups=False),
    }).reset_index()
