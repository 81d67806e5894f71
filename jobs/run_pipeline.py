"""spark-submit entry point (SURVEY §7 M9).

Cluster usage:
  zip -r engine.zip webalizer_spark
  spark-submit --py-files engine.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=rest ... \
      jobs/run_pipeline.py --input lake.db.transcripts --dims lake.db \
      --output lake.db --checkpoint s3://bucket/ckpt --incremental

Local/sandbox usage (parquet shim, no Iceberg jar needed):
  python jobs/run_pipeline.py --input /root/repo/_gen/sf_test \
      --output /tmp/out --checkpoint /tmp/ckpt

The job is the reference's EP1/EP2 lifecycle [webalizer.c ƒmain;
preserve.c]: read -> parse -> enrich -> sessionize (resume-aware when
--incremental and a checkpoint exists) -> fan-out sinks + report tables
-> save checkpoint state + manifest. Prints the end-of-run summary line
(records, seconds, records/sec) like the reference does at the end of
ƒmain.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_config(conf_path: str | None, visit_timeout: int | None,
                   incremental: bool | None):
    """Conf file + CLI override resolution: explicit CLI flags override
    the conf file in BOTH directions (--no-incremental defeats an
    'Incremental yes'; --visit-timeout 0 is honored, not treated as
    unset). Returns (cfg, unknown_keywords)."""
    from dataclasses import replace

    from webalizer_spark import EngineConfig

    unknown: list[str] = []
    if conf_path:
        from webalizer_spark.config import load_conf
        cfg, unknown = load_conf(conf_path)
    else:
        cfg = EngineConfig()
    overrides = {}
    if visit_timeout is not None:
        overrides["visit_timeout_s"] = visit_timeout
    if incremental is not None:
        overrides["incremental"] = incremental
    if overrides:
        cfg = replace(cfg, **overrides)
    return cfg, unknown


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts: parquet dir (with transcripts.parquet) "
                         "or Iceberg table id")
    ap.add_argument("--dims", default=None,
                    help="dimension tables location (default: same as input)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--keep-checkpoints", type=int, default=None,
                    metavar="N",
                    help="after saving state, GC checkpoint versions "
                         "older than the newest N (the live snapshot "
                         "always survives); default: keep all")
    ap.add_argument("--incremental", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="resume from checkpoint; --no-incremental disables "
                         "an 'Incremental yes' from --conf (explicit CLI "
                         "flags override the conf file in both directions)")
    ap.add_argument("--skew-safe", action="store_true",
                    help="use the range-partitioned sessionization path")
    ap.add_argument("--grok", default="split",
                    choices=["split", "regexp", "pandas", "multi"],
                    help="field-extraction strategy; 'multi' dispatches "
                         "per-row on log format (combined/squid/xferlog/w3c)")
    ap.add_argument("--visit-timeout", type=int, default=None,
                    help="seconds of inactivity ending a visit "
                         "(default 1800; overrides --conf)")
    ap.add_argument("--conf", default=None,
                    help="webalizer.conf-style config file (VisitTimeout, "
                         "Top*, Ignore*/Include*/Hide*/Group*, Dump*, "
                         "MangleAgents, Incremental) — a reference user's "
                         "existing conf drives this engine unchanged")
    args = ap.parse_args()
    if args.keep_checkpoints is not None:
        if args.keep_checkpoints < 1:
            ap.error("--keep-checkpoints must be >= 1")
        if args.checkpoint is None:
            ap.error("--keep-checkpoints requires --checkpoint")

    from webalizer_spark import get_spark
    from webalizer_spark.plans.checkpoint import (
        CheckpointPaths,
        compact,
        resume_filter,
        resume_sessionize,
        save_state,
    )
    from webalizer_spark.plans.pipeline import run_pipeline, write_sinks
    from webalizer_spark.sources.tables import TableIO

    spark = get_spark(app_name="webalizer_spark_pipeline", master="")
    cfg, unknown = resolve_config(args.conf, args.visit_timeout,
                                  args.incremental)
    if unknown:
        print(f"conf: ignoring {len(unknown)} non-engine keyword(s): "
              + " ".join(sorted(set(unknown))))

    io_in = TableIO(spark, base_path=args.input)
    tr = io_in.read("transcripts")
    dims_io = TableIO(spark, base_path=args.dims or args.input)
    dims = {n: dims_io.read(n) for n in
            ["role_class", "tool_family", "byte_ranges", "engine_params",
             "name_groups"]}

    t0 = time.time()
    ckpt = CheckpointPaths(args.checkpoint) if args.checkpoint else None
    resumed = (cfg.incremental and ckpt is not None
               and os.path.exists(ckpt.manifest))
    sessionizer = None
    if resumed:
        # multi-format mode: W3C #Fields: directive rows must survive the
        # watermark filter so the resumed batch can parse its W3C records
        tr = resume_filter(tr, ckpt, keep_directives=(args.grok == "multi"))
        # session numbering continues the saved per-conv state
        sessionizer = lambda df: resume_sessionize(  # noqa: E731
            df, ckpt, cfg.visit_timeout_s)

    res = run_pipeline(spark, tr, dims, cfg=cfg, grok_strategy=args.grok,
                       skew_safe=args.skew_safe, sessionizer=sessionizer)
    counts = write_sinks(res, args.output)
    if ckpt is not None:
        save_state(res.enriched, ckpt)
        # S9 history table (webalizer.hist analog): month rows
        # re-aggregated from the CUMULATIVE daily state (correct even
        # when a month spans several incremental runs), upserted by
        # month key — MERGE INTO on Iceberg, read-merge-swap on the
        # parquet shim
        from pyspark.sql import functions as F

        io_out = TableIO(spark, base_path=args.output)
        hist = (spark.read.parquet(ckpt.daily_state)
                .groupBy(F.date_trunc("month", "day_ts").alias("month_ts"))
                .agg(*[F.sum(c).alias(c)
                       for c in ["hits", "files", "pages", "errors",
                                 "bytes", "visits"]]))
        io_out.merge(hist, "history", ["month_ts"])
        if args.keep_checkpoints is not None:
            gone = compact(ckpt, keep_last=args.keep_checkpoints)
            if gone:
                print(f"checkpoint GC: removed versions {gone}")
    sec = time.time() - t0
    total = sum(v for k, v in counts.items()
                if k in ("errors", "by_role"))
    # end-of-run summary [webalizer.c prints N records in S seconds, R/sec]
    print(f"{int(total)} records in {sec:.1f} seconds, "
          f"{total / sec:.0f} records/sec")
    for k, v in sorted(counts.items()):
        print(f"  sink {k}: {int(v)} rows")
    res.unpersist()


if __name__ == "__main__":
    main()
