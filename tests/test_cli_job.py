"""End-to-end test of the spark-submit entry point (jobs/run_pipeline.py)
as a real subprocess: full run, then incremental-with-checkpoint run,
then resume over the complete input — the EP1/EP2 lifecycle the
north_rule grades, exercised through the packaged CLI rather than the
library functions (tests/test_resume.py covers those)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import duckdb
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIMS = ["role_class", "tool_family", "byte_ranges", "engine_params",
        "name_groups"]


def _run_cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         *args],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_incremental_resume(tmp_path):
    from webalizer_spark.datagen import GenParams, ensure_fixture

    full = ensure_fixture(str(tmp_path / "fix"),
                          GenParams(n_convs=300, hot_convs=1, hot_mult=20),
                          tag="cli")
    n_total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{full}/transcripts.parquet'").fetchone()[0]

    # stage a time-half input: dims + the ts <= median slice
    half = tmp_path / "half"
    half.mkdir()
    for d in DIMS:
        shutil.copy(f"{full}/{d}.parquet", half / f"{d}.parquet")
    med = duckdb.sql(f"SELECT median(ts) FROM "
                     f"'{full}/transcripts.parquet'").fetchone()[0]
    duckdb.sql(f"COPY (SELECT * FROM '{full}/transcripts.parquet' "
               f"WHERE ts <= TIMESTAMP '{med}') TO "
               f"'{half}/transcripts.parquet' (FORMAT PARQUET)")
    n_half = duckdb.sql(
        f"SELECT COUNT(*) FROM '{half}/transcripts.parquet'").fetchone()[0]

    out1, ckpt = str(tmp_path / "out1"), str(tmp_path / "ckpt")
    stdout1 = _run_cli("--input", str(half), "--output", out1,
                       "--checkpoint", ckpt, "--incremental")
    assert f"{n_half} records" in stdout1
    with open(os.path.join(out1, "_metrics.json")) as f:
        s1 = json.load(f)["sinks"]
    # every input row routes exactly once: ok spine (by_role) or errors
    assert s1["errors"] + s1["by_role"] == n_half
    with open(os.path.join(ckpt, "manifest.json")) as f:
        m1 = json.load(f)
    # checkpoint state tracks the parse-OK spine, not raw input
    assert m1["total_rows"] == s1["by_role"] and m1["version"] == 1

    # resume over the FULL input: only rows past the watermark process
    out2 = str(tmp_path / "out2")
    stdout2 = _run_cli("--input", full, "--output", out2,
                       "--checkpoint", ckpt, "--incremental")
    assert f"{n_total - n_half} records" in stdout2
    with open(os.path.join(out2, "_metrics.json")) as f:
        s2 = json.load(f)["sinks"]
    assert s2["errors"] + s2["by_role"] == n_total - n_half
    with open(os.path.join(ckpt, "manifest.json")) as f:
        m2 = json.load(f)
    assert m2["total_rows"] == m1["total_rows"] + s2["by_role"]
    assert m2["version"] == 2

    # cumulative daily state equals a single full non-incremental run's
    daily = duckdb.sql(
        f"SELECT CAST(SUM(hits) AS BIGINT) FROM "
        f"'{ckpt}/v=2/daily_state/*.parquet'").fetchone()[0]
    out3 = str(tmp_path / "out3")
    _run_cli("--input", full, "--output", out3)
    full_daily = duckdb.sql(
        f"SELECT CAST(SUM(hits) AS BIGINT) FROM "
        f"'{out3}/reports/daily/*.parquet'").fetchone()[0]
    assert daily == full_daily

    # history table upserted with month rows
    hist = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out2}/history/*.parquet'").fetchone()[0]
    assert hist >= 1


def _mixed_format_fixture(full_dir, dims_src):
    """Deterministic mixed-grammar transcripts: combined/squid/xferlog/w3c
    rows interleaved per (conv, turn), one #Fields: directive row, and a
    corrupt line every 37th row."""
    import datetime as dt

    import pandas as pd

    os.makedirs(full_dir, exist_ok=True)
    for d in DIMS:
        shutil.copy(f"{dims_src}/{d}.parquet", f"{full_dir}/{d}.parquet")

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    w3c_dir = ("#Fields: date time c-ip cs-username cs-method cs-uri-stem "
               "sc-status sc-bytes cs(User-Agent)")
    rows = [("c-dir", -1, "user", w3c_dir, None, base - dt.timedelta(hours=1))]
    n_data = n_bad = 0
    for c in range(60):
        for t in range(8):
            ts = base + dt.timedelta(minutes=c * 7 + t * 3)
            nb = 100 + t
            fmt = (c + t) % 4
            if fmt == 0:
                text = (f"user{c} - - [{ts:%d/%b/%Y:%H:%M:%S} +0000] "
                        f'"GET /tool{t} PROTO/1.1" 200 {nb} "-" '
                        f'"agent/1.{t} (os)"')
            elif fmt == 1:
                epoch = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
                text = (f"{epoch}.000    45 user{c} TCP_HIT/200 {nb} "
                        f"GET /tool{t} u{c % 50}")
            elif fmt == 2:
                text = (f"{ts:%a %b} {ts.day} {ts:%H:%M:%S %Y} 3 user{c} "
                        f"{nb} /tool{t} b _ o r u{c % 50} ftp 0 * c")
            else:
                text = (f"{ts:%Y-%m-%d} {ts:%H:%M:%S} user{c} u{c % 50} "
                        f"GET /tool{t}/e{t} 200 {nb} agent{t % 4}")
            n_data += 1
            if n_data % 37 == 0:
                text = "CORRUPT " + text[:10]
                n_bad += 1
            rows.append((f"conv-{c:04d}", t, "user", text, None, ts))
    pdf = pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["tool"] = pdf["tool"].astype("string")   # all-NULL, keep str type
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")   # Spark rejects NANOS
    pdf.to_parquet(f"{full_dir}/transcripts.parquet", index=False)
    return n_data, n_bad


def test_cli_multi_format_incremental(tmp_path):
    """--grok multi --incremental over a mixed combined/squid/xferlog/w3c
    fixture with a #Fields: directive, split across two batches: the
    directive survives the resume watermark (W3C rows in batch 2 still
    parse), every data row routes exactly once, and manifest totals
    accumulate."""
    from webalizer_spark.datagen import GenParams, ensure_fixture

    dims_src = ensure_fixture(str(tmp_path / "dimfix"),
                              GenParams(n_convs=20), tag="dims")
    full = str(tmp_path / "full")
    n_data, n_bad = _mixed_format_fixture(full, dims_src)

    # time-half batch (directive row ships with both batches' source)
    half = str(tmp_path / "half")
    os.makedirs(half)
    for d in DIMS:
        shutil.copy(f"{full}/{d}.parquet", f"{half}/{d}.parquet")
    med = duckdb.sql(f"SELECT median(ts) FROM '{full}/transcripts.parquet' "
                     f"WHERE turn_idx >= 0").fetchone()[0]
    duckdb.sql(f"COPY (SELECT * FROM '{full}/transcripts.parquet' "
               f"WHERE ts <= TIMESTAMP '{med}' OR turn_idx < 0) TO "
               f"'{half}/transcripts.parquet' (FORMAT PARQUET)")
    n_half = duckdb.sql(
        f"SELECT COUNT(*) FROM '{half}/transcripts.parquet' "
        f"WHERE turn_idx >= 0").fetchone()[0]

    out1, ckpt = str(tmp_path / "out1"), str(tmp_path / "ckpt")
    stdout1 = _run_cli("--input", half, "--output", out1,
                       "--checkpoint", ckpt, "--incremental",
                       "--grok", "multi")
    assert f"{n_half} records" in stdout1
    with open(os.path.join(out1, "_metrics.json")) as f:
        s1 = json.load(f)["sinks"]
    assert s1["errors"] + s1["by_role"] == n_half
    assert s1["errors"] > 0                      # corrupt lines routed

    out2 = str(tmp_path / "out2")
    stdout2 = _run_cli("--input", full, "--output", out2,
                       "--checkpoint", ckpt, "--incremental",
                       "--grok", "multi")
    assert f"{n_data - n_half} records" in stdout2
    with open(os.path.join(out2, "_metrics.json")) as f:
        s2 = json.load(f)["sinks"]
    assert s2["errors"] + s2["by_role"] == n_data - n_half
    with open(os.path.join(ckpt, "manifest.json")) as f:
        m2 = json.load(f)
    assert m2["version"] == 2
    assert m2["total_rows"] == s1["by_role"] + s2["by_role"]

    # W3C rows in the SECOND batch parsed via the directive: paths of the
    # form /toolN/eN appear only in the w3c grammar, and they reach the
    # ok spine (by_role sink) — impossible without the #Fields: row
    # surviving the resume watermark
    w3c_batch2 = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out2}/by_role/*/*.parquet' "
        f"WHERE log_format = 'w3c' AND path LIKE '%/e%'").fetchone()[0]
    assert w3c_batch2 > 0
