from webalizer_spark.operators.parse import parse_transcripts, split_ok_bad

__all__ = ["parse_transcripts", "split_ok_bad"]
