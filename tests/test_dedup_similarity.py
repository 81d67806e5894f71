from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webalizer_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_remove,
    shingles,
    simhash,
)
from webalizer_spark.operators.similarity import ann_topk, brute_force_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # add exact + near duplicates with known ids
    d7 = base.filter("doc_id = 7").select(
        F.lit(100007).alias("doc_id"), "text", "lang", "source", "n_chars")
    d9 = base.filter("doc_id = 9").select(
        F.lit(100009).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars")
    return base.unionByName(d7).unionByName(d9).cache()


def test_exact_dedup_keeps_lowest_id(spark, docs):
    out = exact_dedup(docs)
    assert out.count() == docs.count() - 1          # one exact dup removed
    assert out.filter("doc_id = 100007").count() == 0
    assert out.filter("doc_id = 7").count() == 1


def test_minhash_lsh_finds_planted_dups(spark, docs):
    sh = shingles(docs)
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (7, 100007) in pairs                     # exact dup always collides
    verified = jaccard_pairs(sh, 0.95, candidates=cand)
    got = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert (7, 100007) in got
    assert (9, 100009) in got                       # near dup (one extra token)


def test_lsh_verified_subset_of_allpairs(spark, docs):
    """LSH+verify finds a SUBSET of the exact all-pairs result (candidate
    generation may miss, never invent)."""
    sh = shingles(docs).cache()
    exact = {(r["doc_a"], r["doc_b"])
             for r in jaccard_pairs(sh, 0.98).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in jaccard_pairs(
               sh, 0.98,
               candidates=lsh_candidate_pairs(minhash_signatures(sh))).collect()}
    assert lsh <= exact
    assert len(lsh) >= 0.8 * len(exact)             # recall on this corpus


def test_simhash_identical_docs_same_fingerprint(spark, docs):
    sh = shingles(docs)
    fp = {r["doc_id"]: r["simhash"] for r in simhash(sh).collect()}
    assert fp[7] == fp[100007]


def test_near_dup_remove_end_to_end(spark, docs):
    out = near_dup_remove(docs, threshold=0.95)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 100007 not in ids and 7 in ids
    assert 100009 not in ids and 9 in ids


def test_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 20")
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ann_topk(emb, queries, k=5, num_planes=4, num_tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["neighbor_id"] in exact_sets[r["query_id"]]
    # 8-table 4-plane LSH: per-table collision ~0.13 for random pairs,
    # much higher for true neighbors; union recall should be solid
    assert total > 0
    assert hit / total > 0.5


def test_ivf_exhaustive_probe_equals_brute_force(spark):
    from webalizer_spark.operators.similarity import ivf_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    exact = sorted(map(tuple, brute_force_topk(emb, queries, k=5).collect()))
    ivf_all = sorted(map(tuple, ivf_topk(emb, queries, k=5, n_cells=8,
                                         n_probe=8).collect()))
    assert ivf_all == exact          # probing every cell == exhaustive


def test_ivf_partial_probe_recall(spark):
    from webalizer_spark.operators.similarity import ivf_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 20")
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(r["neighbor_id"] in es[r["query_id"]] for r in approx)
    assert hit / len(approx) > 0.3   # random vectors; structure is the point
