"""Growth slopes for the capped candidate pair-joins WITH their hot-key
caps ENABLED (round-3 verdict item #9).

BENCH_slope.json measures lsh/simhash/winnow pair joins cap-off (the
exact, oracle-checked configuration). This protocol measures the same
operators with the production cap set, at sf0.1 and the 10x
vocabulary-resampled fixture, and records:
  - wall time at both scales + growth exponent (expect <= the cap-off
    exponent: the cap bounds per-bucket join fan-out at cap^2),
  - whether the drop log actually fired (captured from the operator's
    logger — the cap must be observable, never silent).

Writes BENCH_slope_capped.json. Reuses bench_slope's 10x fixture.
"""

from __future__ import annotations

import json
import logging
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
CAP = 50
MULT = 10


class _LogCatcher(logging.Handler):
    def __init__(self) -> None:
        super().__init__()
        self.records: list[str] = []

    def emit(self, record: logging.LogRecord) -> None:
        self.records.append(record.getMessage())


def main() -> None:
    from bench_slope import make_fixture

    from webalizer_spark import get_spark
    from webalizer_spark.operators import dedup as D

    fixture = make_fixture()
    spark = get_spark(app_name="bench_slope_capped",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})

    catcher = _LogCatcher()
    logging.getLogger("webalizer_spark.dedup").addHandler(catcher)

    def lsh_pairs(sf):
        d = spark.read.parquet(f"{sf}/documents.parquet")
        sig = D.minhash_signatures(D.shingles(d, "text", 1), 8)
        return D.lsh_candidate_pairs(sig, 2, max_bucket_size=CAP)

    def sim_pairs(sf):
        d = spark.read.parquet(f"{sf}/documents.parquet")
        sig = D.simhash(D.shingles(d, "text", 1), bits=16)
        return D.simhash_pairs(sig, max_hamming=2, bits=16,
                               max_block_freq=CAP)

    def win_pairs(sf):
        d = spark.read.parquet(f"{sf}/documents.parquet")
        fp = D.winnow_fingerprints(d, k=3, window=4)
        return D.winnow_copy_pairs(fp, min_shared=3, max_fp_freq=CAP)

    ops = {"lsh_candidate_pairs": lsh_pairs,
           "simhash_pairs": sim_pairs,
           "winnow_copy_pairs": win_pairs}

    result: dict[str, dict] = {}
    for name, fn in ops.items():
        times, fired = {}, {}
        for tag, d in [("1x", BASE), ("10x", fixture)]:
            catcher.records.clear()
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            times[tag] = round(time.time() - t0, 3)
            fired[tag] = any("dropping" in m for m in catcher.records)
            print(f"{name} @{tag}: {times[tag]}s "
                  f"(drop log fired: {fired[tag]})", flush=True)
        exp = math.log(times["10x"] / times["1x"]) / math.log(MULT)
        result[name] = {**times, "growth_exponent": round(exp, 3),
                        "drop_log_fired": fired}
        print(f"{name}: exponent {exp:.3f}", flush=True)

    out = {"protocol": f"cold per-op times at sf0.1 and the {MULT}x "
                       "vocabulary-resampled fixture with hot-bucket cap="
                       f"{CAP} enabled; exponent = log(t10/t1)/log(10); "
                       "drop_log_fired = the operator's logged drop was "
                       "observed at that scale",
           "cap": CAP, "mult": MULT, "queries": result}
    with open(os.path.join(REPO, "BENCH_slope_capped.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["queries"]))


if __name__ == "__main__":
    main()
