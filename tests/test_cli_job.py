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
