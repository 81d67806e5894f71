"""Checkpoint-state manager — the wcmgr analog.

The reference ships `wcmgr` (~1100 LoC [wcmgr.c]), a CLI to inspect and
maintain its DNS-cache/GeoDB state files. The engine's durable state is
the checkpoint directory (plans/checkpoint.py); this utility inspects and
maintains it without starting Spark (pure pyarrow + json — usable on any
box that can see the checkpoint storage).

Usage:
  python tools/state_mgr.py info   <ckpt_dir>     # manifest + table sizes
  python tools/state_mgr.py convs  <ckpt_dir> [n] # top-n convs by sessions
  python tools/state_mgr.py daily  <ckpt_dir>     # merged daily state
  python tools/state_mgr.py verify <ckpt_dir>     # internal consistency
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow.parquet as pq


def _table_dir(base: str, name: str) -> str:
    """Resolve through the manifest's version pointer (torn-write-safe
    layout); falls back to a flat legacy layout."""
    mpath = os.path.join(base, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            v = json.load(f).get("version")
        if v is not None:
            return os.path.join(base, f"v={v}", name)
    return os.path.join(base, name)


def _read(d: str):
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        raise SystemExit(f"no parquet under {d}")
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def info(base: str) -> None:
    with open(os.path.join(base, "manifest.json")) as f:
        m = json.load(f)
    print(f"watermark:  {m['watermark']}")
    print(f"total_rows: {m['total_rows']}")
    print(f"partitions: {len(m['partitions'])} "
          f"(rows min={min(p['rows'] for p in m['partitions'])} "
          f"max={max(p['rows'] for p in m['partitions'])})")
    for t in ["conv_state", "daily_state", "day_conv_state"]:
        tbl = _read(_table_dir(base, t))
        print(f"{t}: {tbl.num_rows} rows, {tbl.nbytes} bytes in memory")


def convs(base: str, n: int = 10) -> None:
    tbl = _read(_table_dir(base, "conv_state")).to_pandas()
    top = tbl.sort_values(["sessions", "conv_id"],
                          ascending=[False, True]).head(n)
    print(top.to_string(index=False))


def daily(base: str) -> None:
    tbl = _read(_table_dir(base, "daily_state")).to_pandas()
    print(tbl.sort_values("day_ts").to_string(index=False))


def verify(base: str) -> int:
    """Consistency: daily hits sum == manifest total; watermark >= every
    conv last_ts; presence table covers every daily day."""
    with open(os.path.join(base, "manifest.json")) as f:
        m = json.load(f)
    import pandas as pd
    d = _read(_table_dir(base, "daily_state")).to_pandas()
    c = _read(_table_dir(base, "conv_state")).to_pandas()
    p = _read(_table_dir(base, "day_conv_state")).to_pandas()
    ok = True
    if int(d["hits"].sum()) != m["total_rows"]:
        print(f"FAIL daily hits {d['hits'].sum()} != manifest {m['total_rows']}")
        ok = False
    wm = pd.Timestamp(m["watermark"])
    if (c["last_ts"] > wm).any():
        print("FAIL conv last_ts beyond watermark")
        ok = False
    if set(d["day_ts"]) != set(p["day_ts"]):
        print("FAIL day coverage mismatch daily_state vs day_conv_state")
        ok = False
    print("OK" if ok else "INCONSISTENT")
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd, base = sys.argv[1], sys.argv[2]
    if cmd == "info":
        info(base)
    elif cmd == "convs":
        convs(base, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    elif cmd == "daily":
        daily(base)
    elif cmd == "verify":
        return verify(base)
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
