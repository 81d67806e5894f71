from webalizer_spark.streaming.session_stream import (
    streaming_session_counts,
    streaming_tool_counts,
)

__all__ = ["streaming_session_counts", "streaming_tool_counts"]
