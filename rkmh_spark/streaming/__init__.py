from rkmh_spark.streaming.stream_classify import (
    classify_file_stream,
    compact_assignments,
    incremental_dedup_stream,
)

__all__ = [
    "classify_file_stream",
    "compact_assignments",
    "incremental_dedup_stream",
]
