"""Reproducible host-capability probes backing BENCH.md's ceilings.

Two embarrassingly-parallel probes characterize what this machine can
deliver at each parallelism level — upper bounds no job can beat:

  cpu   integer busy loops (no memory traffic): measures deliverable
        CPU cycles, i.e. hypervisor steal on a co-tenant VM.
  mem   STREAM-like 128 MB array copy+scale (working set >> LLC):
        measures aggregate memory bandwidth, the binding resource for
        columnar scan/shuffle/cache work.

For each probe and each thread count it prints total work units and,
per step N -> M, the scaling ceiling (work_M / work_N) / (M / N). A
pipeline measuring efficiency E between two parallelism levels should
be judged against these ceilings, not against 1.0: on a real cluster
every 4N-executor step brings 4x buses and 4x cores, so the ceilings
are ~1.0 there by construction; on one box they are not.

Usage: python tools/probe_host.py [--threads 2,8,32] [--seconds 6]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn_cpu(q, seconds: float) -> None:
    t0 = time.time()
    x = n = 0
    while time.time() - t0 < seconds:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        n += 1
    q.put(n)


def _burn_mem(q, seconds: float) -> None:
    import numpy as np

    a = np.random.rand(16_000_000)  # 128 MB > any LLC
    b = np.empty_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        a *= 1.0000001
        n += 1
    q.put(n)


def run(target, nt: int, seconds: float) -> int:
    """Spawn nt burner processes and sum their work counters. A worker
    that dies before reporting (OOM kill, import error) must not hang
    the caller forever on q.get — bench_scaling imports this, so a dead
    probe would stall the whole scaling bench; time out and fail loudly
    instead."""
    import queue as queue_mod

    q = mp.Queue()
    ps = [mp.Process(target=target, args=(q, seconds)) for _ in range(nt)]
    for p in ps:
        p.start()
    try:
        tot = 0
        for _ in ps:
            try:
                tot += q.get(timeout=seconds * 3 + 30)
            except queue_mod.Empty:
                dead = [p.exitcode for p in ps if p.exitcode not in (0, None)]
                raise RuntimeError(
                    f"probe worker died before reporting "
                    f"(exitcodes={dead}); host probe unusable") from None
    finally:
        for p in ps:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="2,8,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    threads = [int(t) for t in args.threads.split(",")]

    out: dict[str, dict] = {}
    for name, fn in [("cpu", _burn_cpu), ("mem", _burn_mem)]:
        work = {nt: run(fn, nt, args.seconds) for nt in threads}
        ceilings = {}
        for lo, hi in zip(threads, threads[1:]):
            ceilings[f"{lo}->{hi}"] = round(
                (work[hi] / work[lo]) / (hi / lo), 4)
        out[name] = {"work": {str(k): v for k, v in work.items()},
                     "ceilings": ceilings}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
