"""Per-turn text-equality verification at scale (north_star: "routed-row
equality and per-turn text equality against the reference").

Row-by-row comparison of two 10^12-row tables is a full co-partitioned
join — correct but wasteful when the answer is almost always "equal".
This operator computes an order- and partition-INDEPENDENT fingerprint
rollup instead [the SURVEY §7 hard-part 3 design: per-partition hash
rollup, not row-by-row compare]:

  row -> md5(keys || values)         (128-bit, engine-portable)
      -> bucket = top bits mod N     (N ~ 1024: driver-sized result)
      -> per bucket: COUNT + exact DECIMAL SUMs of two 60-bit halves
         (sum is commutative/associative -> shuffle- and order-proof,
          and multiset-sensitive — unlike XOR, a row duplicated twice
          cannot cancel itself out)

Two tables are equal iff all N bucket rows match — an O(N) driver
compare. On mismatch, the differing buckets bound the search space to
(rows/N) for a drill-down equi-join restricted to those buckets.
DuckDB can compute the same rollup (md5 + decimal sums), so this also
works as a cross-engine oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def hash_rollup(df: DataFrame, key_cols: list[str], value_cols: list[str],
                n_buckets: int = 1024) -> DataFrame:
    """Bucketed content fingerprint: (bucket, rows, sum1, sum2)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in [*key_cols, *value_cols]]
    row_h = F.md5(F.concat_ws(_SEP, *cols))
    h1 = F.conv(F.substring(row_h, 1, 15), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(row_h, 17, 15), 16, 10).cast("decimal(38,0)")
    bucket = F.pmod(
        F.conv(F.substring(row_h, 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets))
    return (df.select(bucket.alias("bucket"), h1.alias("_h1"),
                      h2.alias("_h2"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum("_h1").alias("sum1"),
                 F.sum("_h2").alias("sum2")))


def mismatched_buckets(a: DataFrame, b: DataFrame, key_cols: list[str],
                       value_cols: list[str],
                       n_buckets: int = 1024) -> DataFrame:
    """Buckets where the two tables differ (empty result == equal).

    Each side is ONE scan + one tiny aggregate; the compare is a join
    over <= n_buckets rows. Columns: bucket, rows_a/b, sum1_a/b.
    """
    ra = hash_rollup(a, key_cols, value_cols, n_buckets)
    rb = hash_rollup(b, key_cols, value_cols, n_buckets)
    j = ra.alias("a").join(rb.alias("b"), "bucket", "full_outer")
    neq = (lambda c: ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")))
    return (j.filter(neq("rows") | neq("sum1") | neq("sum2"))
            .select("bucket",
                    F.col("a.rows").alias("rows_a"),
                    F.col("b.rows").alias("rows_b"),
                    F.col("a.sum1").alias("sum1_a"),
                    F.col("b.sum1").alias("sum1_b")))


def per_turn_text_equal(a: DataFrame, b: DataFrame,
                        n_buckets: int = 1024) -> bool:
    """The north_star per-turn invariant: text equality under stable
    (conv_id, turn_idx) keys. True iff every bucket fingerprint matches."""
    return mismatched_buckets(
        a, b, ["conv_id", "turn_idx"], ["text"], n_buckets).isEmpty()


def drill_down(a: DataFrame, b: DataFrame, buckets: list[int],
               key_cols: list[str], value_cols: list[str],
               n_buckets: int = 1024) -> DataFrame:
    """Row-level diff RESTRICTED to the mismatched buckets: each side
    scans once with a bucket-pruned filter (rows/n_buckets of the data),
    then a full-outer join on keys surfaces the differing rows."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in [*key_cols, *value_cols]]
    row_h = F.md5(F.concat_ws(_SEP, *cols))
    bucket = F.pmod(
        F.conv(F.substring(row_h, 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets))
    fa = a.filter(bucket.isin(buckets)).select(
        *key_cols, F.struct(*value_cols).alias("_va"))
    fb = b.filter(bucket.isin(buckets)).select(
        *key_cols, F.struct(*value_cols).alias("_vb"))
    return (fa.join(fb, key_cols, "full_outer")
            .filter(~F.col("_va").eqNullSafe(F.col("_vb"))))
