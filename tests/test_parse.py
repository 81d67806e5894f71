from __future__ import annotations

from pyspark.sql import functions as F

from webalizer_spark.operators.parse import parse_transcripts, split_ok_bad


def _counts(df):
    return df.selectExpr(
        "count_if(parse_ok) ok", "count_if(not parse_ok) bad",
        "sum(length(coalesce(actor,''))+length(coalesce(referrer,''))"
        "+status+nbytes) chk").collect()[0]


def test_grok_strategies_agree(spark, transcripts):
    base = None
    for strat in ["split", "regexp", "pandas"]:
        row = _counts(parse_transcripts(transcripts, strat))
        if base is None:
            base = row
        assert row == base, f"strategy {strat} diverges: {row} != {base}"


def test_parse_ok_bad_split(spark, transcripts):
    parsed = parse_transcripts(transcripts)
    ok, bad = split_ok_bad(parsed)
    total = transcripts.count()
    n_ok, n_bad = ok.count(), bad.count()
    assert n_ok + n_bad == total
    # corruption rate ~1% (FIXTURES.md): every corrupt line and only
    # corrupt-ish lines route to the errors sink
    assert 0.003 < n_bad / total < 0.02


def test_per_turn_text_equality(spark, transcripts):
    """input_hint invariant: the datetime grokked out of `text` equals ts
    exactly, per turn, under stable (conv_id, turn_idx) ordering."""
    parsed = parse_transcripts(transcripts)
    assert parsed.filter("parse_ok and ts_text != ts").count() == 0
    assert parsed.filter("parse_ok and actor != role").count() == 0


def test_bytes_dash_is_zero(spark, transcripts):
    parsed = parse_transcripts(transcripts)
    dash = parsed.filter(F.col("text").rlike(r'" \d{3} - "'))
    assert dash.count() > 0
    assert dash.filter("parse_ok and nbytes != 0").count() == 0
