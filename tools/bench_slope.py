"""Growth-slope bench for the heavy candidate-join queries (round-3
verdict item: emb_ann_topk and doc_winnow_fingerprints/pairs were the
slowest headline entries — measure how their runtime grows with corpus
size and record the exponent in BENCH.md).

Protocol: time each query at sf0.1 (5 000 docs / 2 000 vectors) and at a
10x fixture (50 000 docs / 20 000 vectors) synthesized by VOCABULARY
RESAMPLING — new docs drawn token-by-token from the sf0.1 empirical token
distribution, new vectors drawn from the same near-uniform range — NOT by
duplicating rows (duplication would multiply near-dup density and change
the problem shape, not just its size). Growth exponent =
log(t_10x / t_1x) / log(10); ~1.0 = linear.

Writes BENCH_slope.json. Fixture cached under _bench_data/slope10x.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
OUT10 = os.path.join(REPO, "_bench_data", "slope10x")
MULT = 10
QUERIES = ["doc_winnow_fingerprints", "doc_winnow_pairs", "emb_ann_topk"]


def make_fixture() -> str:
    if (os.path.exists(f"{OUT10}/documents.parquet")
            and os.path.exists(f"{OUT10}/embeddings.parquet")):
        return OUT10
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT10, exist_ok=True)
    rng = np.random.default_rng(1234)

    docs = pq.read_table(f"{BASE}/documents.parquet").to_pandas()
    toks = [t for txt in docs["text"] for t in txt.split(" ")]
    vocab, counts = np.unique(np.array(toks), return_counts=True)
    probs = counts / counts.sum()
    lengths = np.array([len(t.split(" ")) for t in docs["text"]])
    n_new = len(docs) * MULT
    new_lengths = lengths[rng.integers(0, len(lengths), n_new)]
    texts = [" ".join(rng.choice(vocab, size=ln, p=probs))
             for ln in new_lengths]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_new), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_new),
        "source": pa.array(["slope"] * n_new),
        "n_chars": pa.array([len(t) for t in texts], pa.int32()),
    }), f"{OUT10}/documents.parquet")

    emb = pq.read_table(f"{BASE}/embeddings.parquet").to_pandas()
    dim = len(emb["embedding"].iloc[0])
    lo = min(min(v) for v in emb["embedding"].head(100))
    hi = max(max(v) for v in emb["embedding"].head(100))
    n_vec = len(emb) * MULT
    vecs = rng.uniform(lo, hi, (n_vec, dim)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "label": pa.array((np.arange(n_vec) % 10).astype("int32")),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    }), f"{OUT10}/embeddings.parquet")
    return OUT10


def main() -> None:
    import math

    from webalizer_spark import get_spark
    from webalizer_spark.queries import QUERIES as Q

    fixture = make_fixture()
    spark = get_spark(app_name="bench_slope",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})

    result: dict[str, dict] = {}
    for name in QUERIES:
        times = {}
        for tag, d in [("1x", BASE), ("10x", fixture)]:
            t0 = time.time()
            Q[name](spark, d).write.format("noop").mode("overwrite").save()
            times[tag] = round(time.time() - t0, 3)
            print(f"{name} @{tag}: {times[tag]}s", flush=True)
        exp = math.log(times["10x"] / times["1x"]) / math.log(MULT)
        result[name] = {**times, "growth_exponent": round(exp, 3)}
        print(f"{name}: exponent {exp:.3f}", flush=True)

    out = {"protocol": f"cold per-query times at sf0.1 and a {MULT}x "
                       "vocabulary-resampled fixture; exponent = "
                       "log(t10/t1)/log(10); ~1.0 = linear",
           "mult": MULT, "queries": result}
    with open(os.path.join(REPO, "BENCH_slope.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["queries"]))


if __name__ == "__main__":
    main()
