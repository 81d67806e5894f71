"""Deterministic sf1-scale synthetic testdata (100x the graded sf0.01).

/root/testdata ships sf0.001/0.01/0.1 only; the scale-stability sweep
(round-4 verdict item 4) needs the same star schema at sf1. This
generates all ten tables with the SAME schemas and similar distributions
(seeded, chunked numpy -> parquet) into _bench_data/sf1 — correctness at
sf1 does not require the driver's exact rows, only that Spark and DuckDB
agree on the SAME input, which tools/verify_queries.py then checks.

Row counts (10x sf0.1): events 1M, documents 50k, embeddings 20k,
lineitem 6M, orders 1.5M, part 200k, customer 150k, supplier 10k,
nation 25, region 5.

Usage: python tools/gen_sf1.py  (idempotent; ~1 min)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "_bench_data", "sf1")
SEED = 420

EVENT_TYPES = np.array(["view", "click", "purchase", "signup", "error"])
EVENT_P = np.array([0.45, 0.30, 0.10, 0.05, 0.10])
# ~500-word vocabulary: at 50k docs a 30-word vocab would make EVERY doc
# near-similar to every other (dense LSH/simhash candidate graph,
# ~10^8 edges — nothing like a real corpus); 500 words keeps pairwise
# token overlap realistic so near-dup structure comes from the PLANTED
# dups, not from vocabulary exhaustion
_BASE = ("spark line column order small sort fast value scan a query agg "
         "table hash the big merge group stream filter key slow customer "
         "join batch part vector shuffle window broadcast").split()
VOCAB = np.array([w + (str(i) if i else "")
                  for i in range(17) for w in _BASE][:500])
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.6, 0.1, 0.1, 0.1, 0.1])


def _w(name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"),
                   row_group_size=256 * 1024)
    print(f"  {name}: {tbl.num_rows} rows")


def gen_events(n: int = 1_000_000, users: int = 15_000) -> None:
    rng = np.random.default_rng(SEED)
    eid = np.arange(n, dtype=np.int64)
    # ts increases with event_id across Jan 2024 (testdata shape)
    start = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86400
    offs = np.sort(rng.uniform(0, span, n)) * 1_000_000
    ts = start + offs.astype(np.int64)
    _w("events", pa.table({
        "event_id": eid,
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": rng.integers(0, users, n),
        "event_type": EVENT_TYPES[rng.choice(len(EVENT_TYPES), n, p=EVENT_P)],
        "value": np.round(np.exp(rng.normal(3.0, 1.5, n)), 2),
        "props": np.char.add(np.char.add(
            '{"k": ', rng.integers(0, 100, n).astype(str)), "}"),
    }))


def gen_documents(n: int = 50_000) -> None:
    rng = np.random.default_rng(SEED + 1)
    lens = rng.integers(15, 60, n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 0 and r < 0.03:                   # exact duplicate
            texts.append(texts[i - 1])
            continue
        words = VOCAB[rng.integers(0, len(VOCAB), lens[i])]
        if i > 0 and r < 0.08:                   # near-duplicate: copy,
            prev = texts[i - 1].split()          # perturb a few words
            for _ in range(3):
                prev[rng.integers(0, len(prev))] = str(
                    VOCAB[rng.integers(0, len(VOCAB))])
            texts.append(" ".join(prev))
            continue
        texts.append(" ".join(words))
    t = pa.array(texts, pa.string())
    _w("documents", pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": t,
        "lang": LANGS[rng.choice(len(LANGS), n, p=LANG_P)],
        "source": np.char.add("src", rng.integers(0, 20, n).astype(str)),
        "n_chars": np.array([len(x) for x in texts], np.int64),
    }))


def gen_embeddings(n: int = 20_000, dim: int = 64, k: int = 10) -> None:
    rng = np.random.default_rng(SEED + 2)
    label = rng.integers(0, k, n)
    # weak cluster structure (within-cluster cosine ~0.08): near-dup
    # structure must come from the PLANTED dups, not from every
    # same-label pair clearing the 0.45 cosine threshold — tight
    # clusters here made ALL 2k-per-cluster vectors mutual near-dups
    # (~20M edges, nothing like a real embedding corpus)
    cents = rng.normal(0, 0.3, (k, dim))
    v = cents[label] + rng.normal(0, 1.0, (n, dim))
    dup = rng.random(n) < 0.02                    # planted near-dups
    src = rng.integers(0, n, n)
    v[dup] = v[src[dup]] + rng.normal(0, 1e-3, (int(dup.sum()), dim))
    _w("embeddings", pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(v.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(label.astype(np.int32), pa.int32()),
    }))


def gen_tpch(sf_li: int = 6_000_000) -> None:
    rng = np.random.default_rng(SEED + 3)
    n_ord, n_part, n_supp, n_cust = sf_li // 4, 200_000, 10_000, 150_000
    _w("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)]}))
    _w("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32),
                                pa.int32())}))
    _w("supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": np.char.add("Supplier#", np.arange(n_supp).astype(str)),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32),
                                pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)}))
    _w("customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": np.char.add("Customer#", np.arange(n_cust).astype(str)),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32),
                                pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(["BUILDING", "MACHINERY", "AUTOMOBILE",
                                  "HOUSEHOLD", "FURNITURE"])[
            rng.integers(0, 5, n_cust)]}))
    _w("part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add("part ", np.arange(n_part).astype(str)),
        "p_brand": np.char.add("Brand#", rng.integers(10, 55, n_part)
                               .astype(str)),
        "p_type": np.char.add("TYPE ", rng.integers(0, 150, n_part)
                              .astype(str)),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32),
                           pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2)}))
    # testdata date range is 1995..2001 (TPC-H era) — the Q1-shape
    # pricing-summary filter (l_shipdate <= 1998-09-02) must select a
    # real subset, not none and not all
    odate = (np.datetime64("1995-01-01", "us").astype(np.int64)
             + rng.integers(0, 2500 * 86400, n_ord) * 1_000_000)
    _w("orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 400000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": np.char.add(
            rng.integers(1, 6, n_ord).astype(str), "-PRIORITY")}))
    n = sf_li
    sdate = (np.datetime64("1995-01-01", "us").astype(np.int64)
             + rng.integers(0, 2500 * 86400, n) * 1_000_000)
    _w("lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n),
        "l_partkey": rng.integers(0, n_part, n),
        "l_suppkey": rng.integers(0, n_supp, n),
        "l_linenumber": pa.array((np.arange(n) % 7 + 1).astype(np.int32),
                                 pa.int32()),
        "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n), 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n)],
        "l_shipdate": pa.array(sdate, pa.timestamp("us"))}))


def main() -> None:
    marker = os.path.join(OUT, ".complete")
    if os.path.exists(marker):
        print(f"sf1 already generated at {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)
    gen_events()
    gen_documents()
    gen_embeddings()
    gen_tpch()
    with open(marker, "w") as f:
        f.write(f"seed={SEED}\n")
    print(f"sf1 written to {OUT}")


if __name__ == "__main__":
    main()
