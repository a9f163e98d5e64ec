"""Event-time windowed aggregation over a stream (watermark + window).

The reference processes arrival-order only (SURVEY.md §2.8: no
timestamps), so this has no rkmh analog — it is the Structured-Streaming
operator a crawl-ingest pipeline needs on top: pages/events bucketed into
event-time windows with bounded state via watermarking (late data older
than the watermark is dropped, state for closed windows is evicted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """stream → (window.start, window.end, key, n, sum_value).

    Append-mode-safe: the watermark bounds both late data and state size —
    the state store holds only windows newer than (max event time − delay),
    which is what makes this viable on an unbounded crawl stream.
    """
    # watermarks require TIMESTAMP (tz-aware); parquet often carries NTZ
    events_stream = events_stream.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    return (
        events_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )
