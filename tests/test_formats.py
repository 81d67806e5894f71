"""Multi-format decode dispatch (S2): combined / squid / xferlog analogs
normalized to the canonical raw-field struct."""

from __future__ import annotations

from webalizer_spark.functions.formats import apply_grok_multi

LINES = [
    # combined (FIXTURES grammar)
    ('assistant - u7 [28/Feb/2024:11:42:11 +0000] "SAY /browser PROTO/1.1"'
     ' 206 29939 "proto://eng-1.example/?q=a+b" "claude/6.7 (linux)"',
     "combined",
     dict(actor="assistant", verb="SAY", path="browser", status_text="206",
          bytes_text="29939", auth_user="u7")),
    # squid-native analog: epoch.ms elapsed actor code/status bytes verb path user
    ("1709120531.123   250 conv-42 HIT/200 5120 CALL /python u3 -",
     "squid",
     dict(actor="conv-42", verb="CALL", path="/python", status_text="200",
          bytes_text="5120", auth_user="u3", dt_text="1709120531")),
    # FTP xferlog analog
    ("Wed Feb 28 11:42:11 2024 3 conv-9 4096 /data/file.bin b _ o r u9 ftp 0 * c",
     "xferlog",
     dict(actor="conv-9", bytes_text="4096", path="/data/file.bin",
          auth_user="u9")),
    # garbage
    ("total garbage line", "combined", dict(actor=None, status_text=None)),
]


def test_detect_and_extract(spark):
    df = spark.createDataFrame([(l,) for l, _, _ in LINES], "text string")
    rows = {r["text"]: r for r in apply_grok_multi(df).collect()}
    for line, fmt, fields in LINES:
        r = rows[line]
        assert r["log_format"] == fmt, line
        for k, v in fields.items():
            assert r[k] == v, f"{fmt}.{k}: {r[k]!r} != {v!r}"


def test_explicit_format_column(spark):
    df = spark.createDataFrame(
        [(LINES[1][0], "squid")], "text string, fmt string")
    r = apply_grok_multi(df, format_col="fmt").collect()[0]
    assert r["status_text"] == "200" and r["actor"] == "conv-42"
