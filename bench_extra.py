"""Round-7 optimization harness (guide §1: measure first; noop-sink
isolation §1.4; job labels §1.5). NOT part of the driver contract —
bench.py stays frozen; numbers from here are cited in
OPTIMIZATION_r07.md only.

Usage:
  python bench_extra.py q [names...]       time queries via noop sink
      (default: the bench.py HEADLINE list), REPEATS env (default 2),
      prints per-query seconds (all samples + min).
  python bench_extra.py explain <tag> [names...]
      dump .explain('formatted') to plans/r07/<name>_<tag>.txt
  python bench_extra.py pipeline           per-stage pipeline timing
      (parse/enrich/sessionize/persist/report fan-out/writes).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _all_queries():
    import webalizer_spark.queries_synth  # noqa: F401
    from webalizer_spark.queries import QUERIES, UNGRADED

    return {**UNGRADED, **QUERIES}


def _headline() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def _spark():
    from webalizer_spark import get_spark

    return get_spark(app_name="webalizer_spark_bench_extra",
                     extra_confs={"spark.ui.showConsoleProgress": "false"})


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]) -> None:
    qs = _all_queries()
    names = names or _headline()
    reps = int(os.environ.get("REPEATS", "2"))
    spark = _spark()
    for name in names:
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(samples):.3f} samples={samples}",
              flush=True)


def cmd_explain(tag: str, names: list[str]) -> None:
    qs = _all_queries()
    names = names or _headline()
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = _spark()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)",
              flush=True)


def cmd_pipeline() -> None:
    import shutil

    from bench import BENCH_BASE, bench_fixture
    from webalizer_spark.plans.pipeline import run_pipeline, write_sinks

    fixture = bench_fixture()
    spark = _spark()
    tr = spark.read.parquet(f"{fixture}/transcripts.parquet")
    dims = {n: spark.read.parquet(f"{fixture}/{n}.parquet")
            for n in ["role_class", "tool_family", "byte_ranges",
                      "engine_params", "name_groups"]}
    out = os.path.join(BENCH_BASE, "_out_extra")
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    res = run_pipeline(spark, tr, dims)
    t_build = time.time() - t0

    spark.sparkContext.setJobDescription("spine materialize")
    t0 = time.time()
    n = res.enriched.count()
    t_spine = time.time() - t0

    stage_times = {}
    for label, df in [("errors", res.errors),
                      ("tool_calls", res.tool_calls)]:
        spark.sparkContext.setJobDescription(f"noop {label}")
        t0 = time.time()
        _noop(df)
        stage_times[label] = round(time.time() - t0, 3)
    t0 = time.time()
    for name, df in res.reports.items():
        spark.sparkContext.setJobDescription(f"noop report {name}")
        _noop(df)
    stage_times["reports_noop_seq"] = round(time.time() - t0, 3)

    t0 = time.time()
    counts = write_sinks(res, out)
    t_writes = time.time() - t0
    res.unpersist()
    print(f"build(lazy)={t_build:.3f}s spine_count={t_spine:.3f}s "
          f"rows={n}")
    print(f"stage_noop={stage_times}")
    print(f"write_sinks(all, incl. spine already hot)={t_writes:.3f}s "
          f"sinks={len(counts)}")


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] == "q":
        cmd_queries(sys.argv[2:])
    elif sys.argv[1] == "explain":
        cmd_explain(sys.argv[2], sys.argv[3:])
    elif sys.argv[1] == "pipeline":
        cmd_pipeline()
    else:
        raise SystemExit(f"unknown command {sys.argv[1]}")


if __name__ == "__main__":
    main()
