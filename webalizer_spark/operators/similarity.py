"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (broadcast the query set,
never shuffle the corpus); random-hyperplane LSH bucketing is the scale
path (signature equi-join restricts the candidate set). All arithmetic
is built-in expressions (zip_with/aggregate folds) — no Python.
Oracle-checked in queries.py (emb_cosine_topk, emb_lsh_signatures,
emb_lsh_buckets, emb_near_dup_cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), 0D,"
        " (acc, v) -> acc + v)")
_NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))"


def cosine(a: str, b: str) -> F.Column:
    return (F.expr(_DOT.format(a=a, b=b))
            / (F.expr(_NORM.format(a=a)) * F.expr(_NORM.format(a=b))))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: broadcast(queries) x corpus, per-query size-k window.

    At scale the corpus never moves: each executor streams its corpus
    partition against the broadcast queries; ranking is per-query
    row_number (size-k heap semantics via TakeOrdered per partition would
    need an agg — the window over query_id keys is small)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    pairs = (F.broadcast(q).crossJoin(c)
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("cos", cosine("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))


def lsh_signatures(emb: DataFrame, num_planes: int = 8, dim: int = 64,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   num_tables: int = 1) -> DataFrame:
    """Deterministic random-hyperplane signatures: md5-seeded +-1 weights,
    exact-decimal projections (sign is order-independent).

    With num_tables > 1 emits one signature row per (id, table) — the
    multi-table LSH layout (recall compounds across tables: a true
    neighbor is a candidate if it collides in ANY table).
    """
    spark = emb.sparkSession
    dims = spark.range(dim).select(F.col("id").cast("int").alias("i"))
    planes = (spark.range(num_tables * num_planes)
              .select((F.col("id") % num_planes).cast("int").alias("j"),
                      (F.col("id") / num_planes).cast("int").alias("t")))
    wt = F.when(
        F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("t").cast("string"), F.col("j").cast("string"),
            F.col("i").cast("string"))), 1, 8),
            16, 10).cast("bigint") % 2 == 0,
        F.lit(1.0)).otherwise(F.lit(-1.0))
    w = planes.crossJoin(dims).withColumn("wt", wt)
    x = (F.element_at(vec_col, F.col("i") + 1).cast("double")
         * F.col("wt")).cast("decimal(18,12)")
    proj = (emb.crossJoin(F.broadcast(w))
            .groupBy(id_col, "t", "j").agg(F.sum(x).alias("p")))
    bit = F.when(F.col("p") >= 0,
                 F.pow(F.lit(2), F.col("j")).cast("bigint")).otherwise(F.lit(0))
    return proj.groupBy(id_col, "t").agg(
        F.sum(bit).cast("bigint").alias("sig"))


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             num_planes: int = 4, num_tables: int = 8, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: exact ranking restricted to LSH-bucket candidates,
    unioned across num_tables independent tables (standard multi-table
    random-hyperplane LSH: per-table collision prob ~ (1 - theta/pi)^b,
    recall 1-(1-p)^L). The (table, signature) equi-join + distinct
    replaces the full cross join; recall vs the exact baseline is
    asserted in tests/test_dedup_similarity.py."""
    sig_c = lsh_signatures(corpus, num_planes, dim, id_col, vec_col, num_tables)
    sig_q = lsh_signatures(queries, num_planes, dim, id_col, vec_col, num_tables)
    q = (queries.join(sig_q, id_col)
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                 F.col("t").alias("qt"), F.col("sig").alias("qsig")))
    c = (corpus.join(sig_c, id_col)
         .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                 F.col("t").alias("ct"), F.col("sig").alias("csig")))
    # distinct on ids only (cheap), vectors joined back after — never
    # dedupe on array payloads
    cand_ids = (F.broadcast(q.drop("qv")).join(
        c.drop("cv"), (F.col("qt") == F.col("ct"))
        & (F.col("qsig") == F.col("csig")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct())
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"))
    pairs = (cand_ids.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
             .withColumn("cos", cosine("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_probe: int = 1) -> DataFrame:
    """Assign each vector to its n_probe nearest centroids by cosine.

    centroids is tiny (n_cells rows) -> broadcast cross join + per-vector
    top-n_probe window; the corpus never shuffles on the payload.
    """
    c = centroids.select(F.col("cell_id"), F.col("centroid"))
    scored = (corpus.select(F.col(id_col), F.col(vec_col))
              .crossJoin(F.broadcast(c))
              .withColumn("csim", cosine(vec_col, "centroid")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("csim").desc(), F.col("cell_id").asc())
    return (scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n_probe)
            .select(id_col, "cell_id"))


def ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic seed centroids: the n_cells lowest-id vectors.

    Production IVF trains centroids (k-means over a sample); the engine
    keeps centroid CHOICE pluggable and deterministic here so results are
    reproducible — the index structure (assign -> invert -> probe) is the
    part that matters at scale.
    """
    return (corpus.orderBy(F.col(id_col).asc()).limit(n_cells)
            .select(F.monotonically_increasing_id().cast("int").alias("cell_id"),
                    F.col(vec_col).alias("centroid")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: inverted-file search. Corpus vectors live in their
    1 nearest cell; each query probes its n_probe nearest cells and ranks
    exactly within the probed candidates. n_probe == n_cells degenerates
    to exhaustive search (asserted equal to brute force in tests)."""
    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    corpus_cells = ivf_assign(corpus, cents, id_col, vec_col, 1) \
        .withColumnRenamed(id_col, "neighbor_id")
    query_probes = ivf_assign(queries, cents, id_col, vec_col, n_probe) \
        .withColumnRenamed(id_col, "query_id")
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv")).join(corpus_cells, "neighbor_id")
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv")).join(query_probes, "query_id")
    pairs = (F.broadcast(qv).join(cv, "cell_id")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", "qv", "cv").distinct()
             .withColumn("cos", cosine("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    F.round("cos", 6).alias("cos")))
