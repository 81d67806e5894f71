"""Resume-equivalence property (SURVEY §5.2 prop b): run full vs
run-half -> checkpoint -> resume-half => identical results."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from webalizer_spark.operators.sessionize import sessionize
from webalizer_spark.plans.checkpoint import (
    CheckpointPaths,
    load_manifest,
    merge_daily,
    resume_filter,
    resume_sessionize,
    save_state,
)

CKPT = "/root/repo/_gen/_ckpt_test"


@pytest.fixture(scope="module")
def parsed_ok(spark, transcripts):
    from webalizer_spark.operators.parse import parse_transcripts, split_ok_bad

    parsed = parse_transcripts(transcripts).persist()
    ok, _ = split_ok_bad(parsed)
    yield ok
    parsed.unpersist()


@pytest.fixture(scope="module")
def halves(spark, parsed_ok):
    """Split the fixture at the median ts — the 'already processed' half
    and the 'new log records' half (EP2)."""
    mid_row = parsed_ok.select(
        F.percentile_approx(F.col("ts").cast("timestamp").cast("long"),
                            0.5).alias("m")).collect()[0]
    mid = F.from_unixtime(F.lit(mid_row["m"])).cast("timestamp")
    first = parsed_ok.filter(F.col("ts").cast("timestamp") <= mid)
    second = parsed_ok.filter(F.col("ts").cast("timestamp") > mid)
    return first, second


def test_resume_sessionization_equals_full(spark, parsed_ok, halves):
    first, second = halves
    full = sessionize(parsed_ok)

    shutil.rmtree(CKPT, ignore_errors=True)
    ckpt = CheckpointPaths(CKPT)
    save_state(sessionize(first), ckpt)

    resumed = resume_sessionize(resume_filter(parsed_ok, ckpt), ckpt)

    cols = ["conv_id", "turn_idx", "is_new_session", "session_seq"]
    full_second = (full.join(second.select("conv_id", "turn_idx"),
                             ["conv_id", "turn_idx"])
                   .select(*cols).toPandas()
                   .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    got = (resumed.select(*cols).toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got.equals(full_second)


def test_resume_daily_merge_equals_full(spark, parsed_ok, halves):
    first, second = halves
    shutil.rmtree(CKPT, ignore_errors=True)
    ckpt = CheckpointPaths(CKPT)
    first_sessions = sessionize(first)
    save_state(first_sessions, ckpt)

    new = resume_sessionize(resume_filter(parsed_ok, ckpt), ckpt)
    merged = merge_daily(new, ckpt).toPandas() \
        .sort_values("day_ts").reset_index(drop=True)

    full = sessionize(parsed_ok)
    ref = (full.groupBy(F.date_trunc("day", "ts").alias("day_ts")).agg(
        F.count(F.lit(1)).alias("hits"),
        F.count_if(F.col("status") == 200).alias("files"),
        F.count_if(F.col("tool").isNotNull()).alias("pages"),
        F.count_if(F.col("status") >= 400).alias("errors"),
        F.sum("nbytes").alias("bytes"),
        F.count_if(F.col("is_new_session")).alias("visits"),
        F.countDistinct("conv_id").alias("sites"))
        .toPandas().sort_values("day_ts").reset_index(drop=True))
    assert merged["day_ts"].tolist() == ref["day_ts"].tolist()
    for c in ["hits", "files", "pages", "errors", "bytes", "visits", "sites"]:
        assert merged[c].astype("int64").tolist() == \
            ref[c].astype("int64").tolist(), c


def test_manifest_lineage(spark, parsed_ok):
    shutil.rmtree(CKPT, ignore_errors=True)
    ckpt = CheckpointPaths(CKPT)
    sessions = sessionize(parsed_ok)
    m = save_state(sessions, ckpt)
    assert m["total_rows"] == parsed_ok.count()
    assert sum(p["rows"] for p in m["partitions"]) == m["total_rows"]
    assert load_manifest(ckpt)["watermark"] == m["watermark"]
