from __future__ import annotations

from webalizer_spark.queries import UNGRADED

SF = "/root/testdata/sf0.01"


def test_approx_distinct_tolerance(spark):
    """A8 scale tier: HLL++ approx distinct within its documented rsd of
    exact (default 5% rsd — allow 15% absolute here)."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {r["day_ts"]: r["sites"] for r in
             ev.groupBy(F.date_trunc("day", "ts").alias("day_ts"))
               .agg(F.countDistinct("user_id").alias("sites")).collect()}
    approx = {r["day_ts"]: r["approx_sites"] for r in
              UNGRADED["evt_approx_distinct"](spark, SF).collect()}
    assert set(exact) == set(approx)
    for d, e in exact.items():
        assert abs(approx[d] - e) <= max(2, 0.15 * e), (d, e, approx[d])
