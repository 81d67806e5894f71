"""Local emulation of the driver's DuckDB cross-check.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
(same parquet), compares row count, column names, and an order-insensitive
value representation (rows sorted, columns sorted by name, values
stringified with exact float repr — stricter than any reasonable hash).

Usage: python tools/verify_queries.py [sf_dir] [name_prefix]
       python tools/verify_queries.py --ungraded [sf_dir] [name_prefix]
       ... --exclude name1,name2   (skip rows whose ORACLE is
       quadratic at the target scale — each skip prints an EXCLUDED
       line so the sweep output stays honest)

--ungraded walks the UNGRADED registry instead (the rows the graded
50-row window can't hold — they grade locally through the same canon
comparison); entries without an oracle report as SKIP/rows-only.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df) -> tuple[list[str], list[tuple]]:
    """pandas -> (sorted colnames, sorted row tuples of canonical strings)."""
    import pandas as pd

    cols = sorted(df.columns)
    out = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\0NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    rows = sorted(tuple(cell(v) for v in r) for r in out.itertuples(index=False))
    return cols, rows


def main() -> int:
    argv = sys.argv[1:]
    excl: set[str] = set()
    if "--exclude" in argv:
        i = argv.index("--exclude")
        excl = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--ungraded"]
    ungraded = "--ungraded" in argv
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    prefix = args[1] if len(args) > 1 else ""

    import duckdb

    # importing queries pulls in queries_synth (tr2_* registration +
    # finalize) on every path — no separate import needed
    from webalizer_spark.queries import ORACLE, QUERIES
    if ungraded:
        from webalizer_spark.queries import UNGRADED, UNGRADED_ORACLE
        QUERIES, ORACLE = UNGRADED, UNGRADED_ORACLE  # noqa: N806

    from webalizer_spark import get_spark

    spark = get_spark(extra_confs={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for name, fn in QUERIES.items():
        if prefix and not name.startswith(prefix):
            continue
        if name in excl:
            print(f"EXCLUDED {name}: quadratic oracle at this scale",
                  flush=True)
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            odf = con.sql(ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(sdf)
        oc, orows = canon(odf)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL {name}: rows {len(sr)} != {len(orows)}")
            n_fail += 1
            continue
        if sr != orows:
            bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
