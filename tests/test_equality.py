"""Per-turn text-equality rollup (north_star invariant): O(buckets)
compare, exact localization of differences."""

from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.equality import (
    drill_down,
    mismatched_buckets,
    per_turn_text_equal,
)


def test_equal_tables_fingerprint_equal(spark, transcripts):
    assert per_turn_text_equal(transcripts, transcripts)
    # partition-layout independence: a repartitioned copy still matches
    shuffled = transcripts.repartition(13)
    assert per_turn_text_equal(transcripts, shuffled)


def test_single_row_difference_detected_and_localized(spark, transcripts):
    b = transcripts.withColumn(
        "text",
        F.when((F.col("conv_id") == "conv-00000005") & (F.col("turn_idx") == 0),
               F.lit("TAMPERED")).otherwise(F.col("text")))
    bad = mismatched_buckets(transcripts, b, ["conv_id", "turn_idx"], ["text"])
    rows = bad.collect()
    assert len(rows) in (1, 2)  # old and new row hash into 1 or 2 buckets
    diff = drill_down(transcripts, b, [r["bucket"] for r in rows],
                      ["conv_id", "turn_idx"], ["text"]).collect()
    keys = {(r["conv_id"], r["turn_idx"]) for r in diff}
    assert keys == {("conv-00000005", 0)}


def test_duplicated_row_not_cancelled(spark):
    """sum (not xor) fingerprints are multiset-sensitive: a row appearing
    twice vs once must mismatch."""
    a = spark.createDataFrame([("c", 0, "x"), ("c", 1, "y")],
                              "conv_id string, turn_idx int, text string")
    b = a.unionByName(spark.createDataFrame(
        [("c", 0, "x")], "conv_id string, turn_idx int, text string"))
    assert not per_turn_text_equal(a, b)
