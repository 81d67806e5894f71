"""Deduplication operators for training-data pipelines.

Exact + near-dup families, all pure DataFrame plans (no Python in the hot
path). The all-pairs variants are exact baselines; the LSH variants are
the 100 TB paths (candidate generation via bucket join instead of a
quadratic self-join). Hash functions are md5-keyed and deterministic, so
results are reproducible across runs/engines (oracle-checked in
queries.py: doc_dedup_exact, doc_ngram_jaccard, doc_minhash_signatures,
doc_minhash_lsh_pairs, doc_simhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash64(col: F.Column, seed: F.Column | None = None) -> F.Column:
    """Deterministic 60-bit int from md5 (engine-portable, unlike
    xxhash64/murmur which DuckDB lacks)."""
    src = col if seed is None else F.concat_ws("|", seed.cast("string"), col)
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, content_col: str = "text",
                order_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-key row per content hash.

    Shuffle shape: ONE groupBy on the 128-bit content hash — at 100 TB
    this is the canonical hash-partition dedup; no sort, no window over
    the full data (row_number per hash via min_by instead).
    """
    h = F.md5(F.col(content_col)).alias("_fp")
    keep = (df.select(h, F.col(order_col))
            .groupBy("_fp").agg(F.min(order_col).alias(order_col)))
    return df.join(keep, order_col, "left_semi")


def shingles(df: DataFrame, content_col: str = "text", n: int = 1,
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram set per document (explode-based)."""
    toks = F.split(F.col(content_col), " ")
    if n == 1:
        sh = toks
    else:
        # sliding window over the token array, JVM-side
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        sh = F.transform(idx, lambda i: F.array_join(
            F.slice(toks, i + 1, n), " "))
    return df.select(id_col, F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(sh: DataFrame, num_hashes: int = 8,
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash: min over md5-keyed hash per seed; ONE groupBy(doc, seed)
    with map-side partial min — the explode fan-out never shuffles raw."""
    spark = sh.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    h = _hash64(F.col("shingle"), F.col("seed"))
    return (sh.crossJoin(F.broadcast(seeds))
            .groupBy(id_col, "seed").agg(F.min(h).alias("minhash")))


def lsh_candidate_pairs(sig: DataFrame, rows_per_band: int = 2,
                        id_col: str = "doc_id") -> DataFrame:
    """LSH banding: docs agreeing on ALL minhashes within a band become
    candidates (bucket equi-join — the scale path replacing all-pairs)."""
    banded = sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    keys = (banded.groupBy(id_col, "band")
            .agg(F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                lambda s: s["minhash"].cast("string")), ",").alias("band_key")))
    a, b = keys.alias("a"), keys.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())


def jaccard_pairs(sh: DataFrame, threshold: float = 0.8,
                  id_col: str = "doc_id",
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact token-set Jaccard. With `candidates` (from LSH) the join is
    restricted to candidate pairs — the verify step of MinHash-LSH dedup;
    without, it is the exact all-pairs baseline (small inputs only)."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                      F.col(f"b.{id_col}").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("i")))
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("szb"))
    jac = F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .filter(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")))


def simhash(sh: DataFrame, bits: int = 16, id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: integer-exact bitwise majority vote."""
    spark = sh.sparkSession
    bits_df = spark.range(bits).select(F.col("id").cast("int").alias("j"))
    per_bit = (sh.withColumn("th", _hash64(F.col("shingle")))
               .crossJoin(F.broadcast(bits_df))
               .groupBy(id_col, "j")
               .agg(F.sum(F.expr("2 * (shiftright(th, j) & 1) - 1")).alias("w")))
    bit = F.when(F.col("w") >= 0,
                 F.pow(F.lit(2), F.col("j")).cast("bigint")).otherwise(F.lit(0))
    return per_bit.groupBy(id_col).agg(
        F.sum(bit).cast("bigint").alias("simhash"))


def near_dup_remove(df: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id", threshold: float = 0.9,
                    num_hashes: int = 8, rows_per_band: int = 2) -> DataFrame:
    """End-to-end near-dup removal: MinHash -> LSH candidates -> exact
    Jaccard verify -> drop the higher-id member of each surviving pair
    (union-find-free greedy: keep the minimum id of each dup component
    found via iterative min propagation is overkill at this tier; the
    greedy pairwise drop is the documented approximation)."""
    sh = shingles(df, content_col, 1, id_col)
    cand = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes, id_col), rows_per_band, id_col)
    dup = jaccard_pairs(sh, threshold, id_col, candidates=cand)
    drop = dup.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")
