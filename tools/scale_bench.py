"""Two-parallelism scaling bench (BASELINE.md evidence protocol).

Runs the identical end-to-end pipeline job on the same input at
local[N] and local[4N] in separate JVMs (2 timed runs each after a
warm-up), reports turns/sec at both and the scaling efficiency
  eff = (rate_4N / rate_N) / 4
Target (north_rule): eff >= 0.8.

Usage: python tools/scale_bench.py [n_low] [n_high] [bench_convs]
Writes results JSON to stdout; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from webalizer_spark import get_spark
from webalizer_spark.plans.pipeline import run_pipeline, write_sinks

fixture = {fixture!r}
spark = get_spark(app_name="scale_bench",
                  extra_confs={{"spark.ui.showConsoleProgress": "false"}})
tr = spark.read.parquet(f"{{fixture}}/transcripts.parquet")
dims = {{n: spark.read.parquet(f"{{fixture}}/{{n}}.parquet")
        for n in ["role_class", "tool_family", "byte_ranges",
                  "engine_params", "name_groups"]}}
out = os.path.join({repo!r}, "_bench_data", "_scale_out")
times = []
for i in range({runs} + 1):
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, tr, dims)
    counts = write_sinks(res, out)
    sec = time.time() - t0
    res.unpersist()
    turns = int(counts["errors"] + counts["by_role"])
    if i > 0:   # first run is warm-up
        times.append(sec)
print("RESULT " + json.dumps({{"turns": turns, "times": times}}))
"""


def run_at(cpus: int, fixture: str, runs: int = 2) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_DRIVER_MEM=os.environ.get(
                   "SPARK_GRAFT_DRIVER_MEM", "48g"))
    script = CHILD.format(repo=REPO, fixture=fixture, runs=runs)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            best = min(r["times"])
            return {"cpus": cpus, "turns": r["turns"], "times": r["times"],
                    "best_sec": round(best, 2),
                    "turns_per_sec": round(r["turns"] / best, 1)}
    raise RuntimeError(f"child failed: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 40000

    sys.path.insert(0, REPO)
    from webalizer_spark.datagen import GenParams, ensure_fixture
    fixture = ensure_fixture(os.path.join(REPO, "_bench_data"),
                             GenParams(n_convs=n_convs, hot_convs=2, hot_mult=500),
                             tag=f"bench_{n_convs}")

    low = run_at(n_low, fixture)
    high = run_at(n_high, fixture)
    eff = (high["turns_per_sec"] / low["turns_per_sec"]) / (n_high / n_low)
    print(json.dumps({"low": low, "high": high,
                      "efficiency": round(eff, 3),
                      "target": 0.8, "pass": eff >= 0.8}, indent=2))


if __name__ == "__main__":
    main()
