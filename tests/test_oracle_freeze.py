"""Round-7 guard: graded oracle SQL is FROZEN for the optimization
round — the driver compares oracle text against its round-start
fingerprints, and any drift in an existing query is graded as a
regression regardless of speed. The fingerprints were snapshotted from
the round-start commit (b053326) and verified byte-identical before
this test was added; an optimization that accidentally edits a graded
oracle string (e.g. an escape-sequence 'cleanup' inside a raw-string
SQL literal — the exact near-miss this round) fails here immediately.
"""

from __future__ import annotations

import hashlib
import json
import os


def test_graded_oracle_sql_is_frozen():
    from webalizer_spark.queries import ORACLE

    path = os.path.join(os.path.dirname(__file__),
                        "oracle_fingerprints_r07.json")
    frozen = json.load(open(path))
    assert set(frozen) == set(ORACLE), \
        sorted(set(frozen) ^ set(ORACLE))
    drift = [k for k, v in ORACLE.items()
             if hashlib.sha256(v.encode()).hexdigest() != frozen[k]]
    assert not drift, f"graded oracle SQL drifted: {drift}"
