"""Packaging claim made executable: the engine must run with the
package importable ONLY from a zip (the `spark-submit --py-files
engine.zip` deployment shape, SURVEY §7 M9) — not from the repo
checkout."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
assert any(p.endswith("engine.zip") for p in sys.path), sys.path
import webalizer_spark
assert "engine.zip" in webalizer_spark.__file__, webalizer_spark.__file__

from pyspark.sql import functions as F

from webalizer_spark import get_spark
from webalizer_spark.operators.parse import parse_transcripts
from webalizer_spark.operators.sessionize import sessionize

spark = get_spark(app_name="zip_pkg_test", shuffle_partitions=2)
line = ('actor0 - - [01/Feb/2024:10:00:0{i} +0000] '
        '"GET /t/x PROTO/1.1" 200 10 "-" "a/1.0 (os)"')
rows = [("c1", i, "user", line.format(i=i), None, None) for i in range(3)]
df = spark.createDataFrame(
    rows, "conv_id string, turn_idx int, role string, text string,"
          " tool string, ts timestamp")
parsed = parse_transcripts(df)
sess = sessionize(parsed.withColumn("ts", F.col("ts_text")))
n_ok = parsed.filter("parse_ok").count()
n_sessions = sess.filter("is_new_session").count()
print(f"ZIPRUN ok={n_ok} sessions={n_sessions}")
"""


def test_engine_runs_from_zip_only(tmp_path):
    zip_path = tmp_path / "engine.zip"
    pkg = os.path.join(REPO, "webalizer_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))

    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    env = {**os.environ, "PYTHONPATH": str(zip_path),
           "SPARK_GRAFT_CPUS": "2"}
    out = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=300, cwd=str(tmp_path), env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIPRUN ok=3 sessions=1" in out.stdout


def test_driver_import_path_front_loads_priority():
    """The driver imports queries_synth BEFORE queries (__spark_entry__
    path), which triggers a circular import: the registry must still end
    up priority-ordered with the newest oracle rows first (round-4
    regression — they previously landed at the tail on this path)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __spark_entry__ as E\n"
        "q, o = E.queries(), E.oracle_sql()\n"
        "assert len(q) == 50 and len(o) == 50, (len(q), len(o))\n"
        "assert list(q)[:4] == ['doc_span_dedup', 'doc_lm_ppl',"
        " 'emb_semdedup_keep', 'doc_tfidf_top'], list(q)[:6]\n"
        "assert list(q) == list(o)\n" % REPO)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
